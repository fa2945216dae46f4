from dungbeetle_spark.functions.numeric import dsum, davg, dmul  # noqa: F401
from dungbeetle_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from dungbeetle_spark.functions.texts import (  # noqa: F401
    norm_text,
    content_md5,
    word_count,
)
