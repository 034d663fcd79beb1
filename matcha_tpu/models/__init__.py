from matcha_tpu.models.hifigan import Generator as HiFiGAN  # noqa: F401
from matcha_tpu.models.hifigan import HiFiGANConfig  # noqa: F401
from matcha_tpu.models.matcha import MatchaTTS  # noqa: F401
