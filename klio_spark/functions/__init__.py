"""North-star extension function library (SURVEY §2.9).

Everything here is built from pyspark.sql.functions expressions (JVM-side,
whole-stage-codegen) unless a docstring says otherwise. Python/pandas UDFs
appear only where Spark's expression language genuinely cannot express the
semantics (multimodal decode).
"""

from klio_spark.functions.bloom import (  # noqa: F401
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
)
from klio_spark.functions.sql_surface import register_sql  # noqa: F401
from klio_spark.functions.vectors import cosine_sim, dot, l2_norm  # noqa: F401
from klio_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    tokens,
)
