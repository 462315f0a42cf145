"""joie_spark — a from-scratch PySpark-native full-text engine with the
query and data-processing capabilities of kore-signet/joie (reference at
/root/reference), extended per the north rule with BM25 top-k, block-max
pruning, delta+varint posting compression, checkpointed/resumable builds
and large-scale training-data pipeline operators."""

from .engine import Engine  # noqa: F401
from .session import get_spark  # noqa: F401
