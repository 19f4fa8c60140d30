"""Large-scale training-data operators (deduplication, similarity
search, text analysis, multimodal plumbing) over the ``documents`` and
``embeddings`` tables.

Design rule shared by every op: the Spark implementation stays in
built-in Catalyst expressions (higher-order functions, no Python in
the hot path), and each op ships a DuckDB oracle SQL builder in the
same module so the correctness pair cannot drift apart. Floating-point
outputs are emitted as floor-scaled integers computed by sequential
left-folds so both engines produce bit-identical values.
"""
