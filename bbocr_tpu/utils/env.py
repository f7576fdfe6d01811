"""Environment helpers: flags and backend detection.

The reference gates behavior on env vars like ``BB_OCR_EASYOCR_GPU`` /
``BB_OCR_DEBUG_AUTOCROP`` (reference ``pipeline_demo/extractor/enhanced_extractor.py:130,147``).
We keep the same truthy-string convention.
"""

from __future__ import annotations

import functools
import os


def env_flag(name: str, default: bool = False) -> bool:
    """True if the env var is a truthy string ("1", "true", "yes", "on")."""
    raw = os.getenv(name)
    if raw is None:
        return default
    return str(raw).strip().lower() in ("1", "true", "yes", "on")


def sync_platform_from_env() -> None:
    """Honor the JAX_PLATFORMS env var over jax.config pinning.

    This machine's axon sitecustomize registers the tunneled TPU and pins
    ``jax_platforms="axon,cpu"`` via jax.config, which silently overrides
    the env var; call this before first device use to restore env-var
    semantics (e.g. JAX_PLATFORMS=cpu for tests/side processes).
    """
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


@functools.lru_cache(maxsize=None)
def enable_compilation_cache(path: str = "") -> None:
    """Point XLA's persistent compilation cache at a local directory.

    Compiles over the relayed TPU link cost 10-80 s EACH; with the disk
    cache, every (program, shape) pays that once per machine instead of
    once per process — serving restarts, bench runs, and training relaunches
    then start warm. Opt out with BB_OCR_COMPILE_CACHE=0; set a custom dir
    via the same variable. Safe no-op on backends without serialization
    support. Must run before the first compile to help that process.
    """
    import jax

    raw = os.getenv("BB_OCR_COMPILE_CACHE", "").strip()
    if raw.lower() in ("0", "false", "off", "no"):
        return
    cache_dir = path or (
        raw if raw and raw.lower() not in ("1", "true", "yes", "on")
        else os.path.expanduser("~/.cache/bbocr_tpu/xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled devices)."""
    return default_backend() not in ("cpu", "gpu")
