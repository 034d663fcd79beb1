from matcha_tpu.utils.pylogger import get_pylogger  # noqa: F401
from matcha_tpu.utils.utils import intersperse  # noqa: F401
