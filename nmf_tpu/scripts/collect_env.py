"""Environment report for bug reports / reproducibility.

The reference vendors PyTorch's ``collect_env.py`` (505 LoC of CUDA/driver
probing); the JAX/TPU equivalent is this compact dump of the versions,
backends, and devices that determine behavior here.

Usage: python -m nmf_tpu.scripts.collect_env
"""
import os
import platform
import sys


def collect() -> dict:
    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
        "machine": platform.machine(),
    }
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy", "scipy"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "unknown")
        except Exception as e:  # pragma: no cover - absent optional dep
            info[mod] = f"not importable ({type(e).__name__})"
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "LIBTPU_INIT_ARGS",
                "TPU_ACCELERATOR_TYPE", "JAX_COMPILATION_CACHE_DIR"):
        if os.environ.get(var):
            info[f"env:{var}"] = os.environ[var]
    try:
        import jax

        info["jax.default_backend"] = jax.default_backend()
        info["jax.devices"] = ", ".join(
            f"{d.platform}:{d.device_kind}" for d in jax.devices())
        info["jax.device_count"] = jax.device_count()
    except Exception as e:  # pragma: no cover
        info["jax.devices"] = f"unavailable ({e})"
    return info


def main():
    for k, v in collect().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
