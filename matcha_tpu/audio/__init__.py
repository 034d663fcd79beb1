from matcha_tpu.audio.mel import (  # noqa: F401
    hann_window_periodic,
    mel_filterbank,
    mel_spectrogram,
    mel_spectrogram_np,
)
from matcha_tpu.audio.stft import istft, stft_magnitude_phase  # noqa: F401
