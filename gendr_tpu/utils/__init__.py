from gendr_tpu.utils.metrics import AverageMeter, Timer  # noqa: F401
from gendr_tpu.utils.profiling import trace  # noqa: F401
