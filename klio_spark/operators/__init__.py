"""klio built-in operators re-expressed as DataFrame transforms.

Every "tagged output" in the reference (found/not_found, process/pass_thru,
drop) becomes a pair of filtered DataFrames computed from one boolean
column — Catalyst sees plain predicates, so they push down, prune, and
fuse into whole-stage codegen.
"""

from klio_spark.operators.filters import (  # noqa: F401
    TaggedSplit,
    check_recipients,
    filter_force,
    filter_ping,
    tag_message_version,
)
from klio_spark.operators.existence import (  # noqa: F401
    check_input_exists,
    check_output_exists,
    path_for,
)
from klio_spark.operators.audit import update_audit_log  # noqa: F401
from klio_spark.operators.counters import count_messages  # noqa: F401
from klio_spark.operators.prologue import run_pipeline, setup_prologue  # noqa: F401
