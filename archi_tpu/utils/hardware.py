"""Backend detection shared by the kernel-dispatch layers."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default backend is real TPU hardware.

    The platform may register as 'tpu' or (via tunneled plugins) 'axon', so
    check the device kind too.
    """
    try:
        if jax.default_backend() == "tpu":
            return True
        dev = jax.devices()[0]
        return "TPU" in getattr(dev, "device_kind", "")
    except Exception:  # pragma: no cover
        return False
