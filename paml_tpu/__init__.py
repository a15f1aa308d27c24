"""paml_tpu: TPU-native phylogenetics (PAML capabilities, JAX/Pallas).

On import, a persistent XLA compilation cache is enabled (unless the
user already configured one or set PAML_TPU_NO_CACHE=1).  First-time
compilation of the larger likelihood programs costs minutes on the TPU
backend; the cache makes every later run of the same model/data shape
start in seconds, including across processes and machines sharing the
cache directory.
"""
import os as _os


def _enable_compilation_cache() -> None:
    if _os.environ.get("PAML_TPU_NO_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return          # user already configured one
        cache = _os.environ.get("PAML_TPU_CACHE_DIR")
        if not cache:
            repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(
                __file__)))
            cache = (_os.path.join(repo, ".jax_cache")
                     if _os.access(repo, _os.W_OK)
                     else _os.path.expanduser("~/.cache/paml_tpu/jax"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:       # pragma: no cover - never block import
        pass


_enable_compilation_cache()
