"""Misc host-side utilities (infra glue layer).

TPU-native counterparts of the reference's utility layer
(matcha/utils/utils.py): blank-token interspersing, plotting, the
user-data dir for downloaded checkpoints, and run wrappers.
"""

import os
import sys
import warnings
from importlib.util import find_spec
from pathlib import Path
from typing import Sequence

import numpy as np

from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def intersperse(lst: list, item) -> list:
    """Put `item` between every element of `lst` (and at both ends).

    Matches the blank-token interleaving of the reference
    (matcha/utils/utils.py:130-134): result length is 2*len(lst)+1.
    """
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result


def extras(cfg) -> None:
    """Apply optional config-controlled niceties before a task starts."""
    if not cfg.get("extras"):
        log.warning("Extras config not found! <cfg.extras=null>")
        return

    if cfg.extras.get("ignore_warnings"):
        log.info("Disabling python warnings! <cfg.extras.ignore_warnings=True>")
        warnings.filterwarnings("ignore")

    if cfg.extras.get("enforce_tags"):
        enforce_tags(cfg, save_to_file=True)

    if cfg.extras.get("print_config"):
        from matcha_tpu.utils.config import print_config_tree

        print_config_tree(cfg, save_to_file=True)


def enforce_tags(cfg, save_to_file: bool = False) -> None:
    """Prompt for run tags when the config provides none (the reference's
    rich_utils.enforce_tags, matcha/utils/rich_utils.py:80-101): on an
    interactive terminal, ask for a comma-separated list (default "dev");
    in a non-interactive run, fall back to ["dev"] with a warning. Only
    process 0 prompts; multiruns must pre-set tags."""
    if cfg.get("tags"):
        return
    if cfg.get("_multirun"):
        raise ValueError("Specify tags before launching a multirun!")
    import jax

    tags = None
    if jax.process_index() == 0 and sys.stdin is not None and sys.stdin.isatty():
        log.warning("No tags provided in config. Prompting user to input tags...")
        raw = input('Enter a list of comma separated tags (default "dev"): ')
        tags = [t.strip() for t in raw.split(",") if t.strip()]
    if not tags:
        log.warning('No tags provided; using default ["dev"]')
        tags = ["dev"]
    cfg["tags"] = tags
    log.info(f"Tags: {tags}")
    out_dir = cfg.get("paths", {}).get("output_dir")
    if save_to_file and out_dir:
        # extras() runs before train() creates the run directory
        os.makedirs(str(out_dir), exist_ok=True)
        with open(os.path.join(str(out_dir), "tags.log"), "w", encoding="utf-8") as f:
            f.write(", ".join(tags) + "\n")


def task_wrapper(task_func):
    """Wrap a task entrypoint with structured failure logging.

    Mirrors the reference's @task_wrapper contract
    (matcha/utils/utils.py:51-103): exceptions are logged (so multiruns
    can continue), and the output dir is always printed.
    """

    def wrap(cfg):
        try:
            metric_dict, object_dict = task_func(cfg=cfg)
        except Exception as ex:
            log.exception("")
            raise ex
        finally:
            output_dir = cfg.get("paths", {}).get("output_dir", None)
            if output_dir is not None:
                log.info(f"Output dir: {output_dir}")
        return metric_dict, object_dict

    return wrap


def get_metric_value(metric_dict: dict, metric_name: str):
    """Safely retrieve the value of an optimized metric for sweepers."""
    if not metric_name:
        log.info("Metric name is None! Skipping metric value retrieval...")
        return None

    if metric_name not in metric_dict:
        raise ValueError(
            f"Metric value not found! <metric_name={metric_name}>\n"
            "Make sure metric name logged during training is correct!\n"
            "Make sure `optimized_metric` name in `hparams_search` config is correct!"
        )

    metric_value = float(metric_dict[metric_name])
    log.info(f"Retrieved metric value! <{metric_name}={metric_value}>")
    return metric_value


def to_numpy(x) -> np.ndarray:
    return np.asarray(x)


def plot_tensor(tensor) -> np.ndarray:
    """Render a 2-D array as an image (HWC uint8-ish float array)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(np.asarray(tensor), aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.canvas.draw()
    data = save_figure_to_numpy(fig)
    plt.close(fig)
    return data


def save_figure_to_numpy(fig) -> np.ndarray:
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf


def save_plot(tensor, savepath: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(np.asarray(tensor), aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.tight_layout()
    fig.savefig(savepath)
    plt.close(fig)


def get_user_data_dir(appname: str = "matcha_tpu") -> Path:
    """Per-user data dir for downloaded model checkpoints.

    ``MATCHA_HOME`` overrides, mirroring the reference
    (matcha/utils/utils.py:177-205).
    """
    matcha_home = os.environ.get("MATCHA_HOME")
    if matcha_home is not None:
        ans = Path(matcha_home).expanduser().resolve(strict=False)
    elif sys.platform == "win32":
        import winreg  # pragma: no cover

        key = winreg.OpenKey(
            winreg.HKEY_CURRENT_USER,
            r"Software\Microsoft\Windows\CurrentVersion\Explorer\Shell Folders",
        )
        dir_, _ = winreg.QueryValueEx(key, "Local AppData")
        ans = Path(dir_).resolve(strict=False)
    elif sys.platform == "darwin":  # pragma: no cover
        ans = Path("~/Library/Application Support/").expanduser()
    else:
        ans = Path.home().joinpath(".local/share")

    final_path = ans.joinpath(appname)
    final_path.mkdir(parents=True, exist_ok=True)
    return final_path


def enable_compilation_cache(cache_dir=None, min_compile_secs: float = 1.0) -> None:
    """Turn on JAX's persistent compilation cache for every entry point.

    First compiles through the remote-compile tunnel cost 160-210 s per
    bucket shape (PERFORMANCE.md); the persistent cache makes every
    process restart reuse them. Cache lives under the user data dir
    (``MATCHA_HOME`` aware) unless ``MATCHA_COMPILATION_CACHE`` /
    ``cache_dir`` overrides; set either to ``"off"``/``"0"`` to disable.
    """
    import jax

    env = os.environ.get("MATCHA_COMPILATION_CACHE")
    target = cache_dir or env
    if target is not None and str(target).lower() in ("off", "0", "false", "none"):
        return
    if target is None:
        target = get_user_data_dir().joinpath("xla_cache")
    try:
        Path(target).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(target))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
        # cache even when only a few devices / CPU (default policy skips some cases)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config name drift across jax versions
        log.warning(f"persistent compilation cache unavailable: {e}")


def assert_model_downloaded(checkpoint_path, url: str, use_wget: bool = True) -> None:
    """Ensure a checkpoint exists locally, downloading it if necessary."""
    import subprocess

    if Path(checkpoint_path).exists():
        log.debug(f"[+] Model already present at {checkpoint_path}!")
        print(f"[+] Model already present at {checkpoint_path}!")
        return
    log.info(f"[-] Model not found at {checkpoint_path}! Will download it")
    print(f"[-] Model not found at {checkpoint_path}! Will download it")
    checkpoint_path = str(checkpoint_path)
    if not use_wget:
        if find_spec("gdown") is None:
            raise RuntimeError("gdown is not installed; cannot download from Google Drive")
        import gdown

        gdown.download(url=url, output=checkpoint_path, quiet=False, fuzzy=True)
    else:
        subprocess.run(["wget", url, "-O", checkpoint_path], check=True)


def pcm24_bytes(audio: np.ndarray) -> bytes:
    """Mono float waveform -> 24-bit little-endian PCM frames (the one
    shared encoder for file writing and HTTP serving)."""
    clipped = np.clip(np.asarray(audio, dtype=np.float32).squeeze(), -1.0, 1.0)
    scaled = (clipped * (2**23 - 1)).astype(np.int32)
    raw = scaled.astype("<i4").tobytes()
    # Keep the low 3 bytes of each little-endian int32 -> 24-bit PCM
    return np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)[:, :3].tobytes()


def write_wav(path, audio: np.ndarray, sample_rate: int = 22050) -> None:
    """Write mono waveform to .wav (24-bit PCM, like the reference CLI).

    Uses soundfile when available; otherwise a stdlib 24-bit PCM writer.
    """
    audio = np.asarray(audio, dtype=np.float32).squeeze()
    try:
        import soundfile as sf

        sf.write(path, audio, sample_rate, "PCM_24")
        return
    except ImportError:
        pass
    import wave

    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(sample_rate)
        f.writeframes(pcm24_bytes(audio))


def read_wav(path) -> tuple:
    """Read a wav file to float32 in [-1, 1]. Returns (audio, sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr
