from comm_detect_spark.plans.checkpoint import CheckpointStore  # noqa: F401
from comm_detect_spark.plans.driver import IterationDriver  # noqa: F401
