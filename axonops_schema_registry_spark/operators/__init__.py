"""Reusable DataFrame operators (the engine's library API).

Each function is a parameterized, composable operator mirroring one row of
SURVEY.md §2's inventory; the query registry in ``..queries`` instantiates
them against the driver's tables.
"""

from axonops_schema_registry_spark.operators.core import (  # noqa: F401
    content_addressed_ids,
    diff_keyed_sets,
    latest_per_key,
    list_with_prefix,
    point_lookup_min,
    with_prev_value,
)
from axonops_schema_registry_spark.operators.skew import (  # noqa: F401
    salted_join,
    write_bucketed,
)
from axonops_schema_registry_spark.operators.text import (  # noqa: F401
    fuzzy_pairs,
    glob_to_regex,
    jaccard_pairs,
    naming_variants,
    normalize_name_snake,
    token_arrays,
    token_set,
)
