"""Generic utilities: timing, tree helpers."""
from mile_tpu.utils.timing import measure_time  # noqa: F401
from mile_tpu.utils.tree import (  # noqa: F401
    count_params,
    tree_stack,
    tree_unstack,
)
