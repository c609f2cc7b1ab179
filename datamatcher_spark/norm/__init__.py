from datamatcher_spark.norm.keys import (  # noqa: F401
    EMPTY_SENTINELS_UPPER,
    ean_variants_expr,
    is_empty_expr,
    norm_domain_expr,
    normalize_for_fuzzy_expr,
    normalize_key_expr,
    normalize_path_expr,
)
from datamatcher_spark.norm.text import extract_text_expr  # noqa: F401
from datamatcher_spark.norm.transforms import transform_expr  # noqa: F401
