"""Pure-Python parity core. No Spark imports anywhere in this subpackage —
every function here is unit-testable in a bare interpreter and is invoked on
executors from inside Arrow-batched pandas UDFs (see
``ragflow_spark.operators.extract``).

Semantics follow holdgh/ragflow v0.13.0 (read-only reference at
/root/reference); each module cites the file:line it models. Code is written
from scratch against those observed semantics.
"""

from ragflow_spark.core.codec import find_codec
from ragflow_spark.core.tokens import num_tokens_from_string, truncate

__all__ = ["find_codec", "num_tokens_from_string", "truncate"]
