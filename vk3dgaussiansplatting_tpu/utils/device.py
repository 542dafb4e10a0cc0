"""Device capability reporting — the GpuProperties equivalent.

The reference gates on device capabilities at startup
(GpuProperties::isPhysicalDeviceSuitable, GpuProperties.cpp:193-280: Vulkan
1.3, shaderInt64, subgroup size >= 16) and exposes a static registry
(timestamp period etc.).  Here the analogue is a platform report and a
suitability check for the pipeline's assumptions.
"""

from __future__ import annotations

import jax

from . import log


def device_report() -> dict:
    d = jax.devices()[0]
    info = {
        "platform": jax.default_backend(),
        "device": str(d),
        "device_kind": getattr(d, "device_kind", "unknown"),
        "num_devices": len(jax.devices()),
        "process_count": jax.process_count(),
        "coords": getattr(d, "coords", None),
        "core_on_chip": getattr(d, "core_on_chip", None),
    }
    try:
        stats = d.memory_stats()
        if stats:
            info["hbm_bytes_limit"] = int(stats.get("bytes_limit", 0))
            info["hbm_bytes_in_use"] = int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return info


def check_suitability(min_devices: int = 1) -> bool:
    """Suitability gate (the isPhysicalDeviceSuitable analogue): a usable
    backend with enough devices; warns (not fails) off-TPU since every
    pipeline tier has an XLA fallback."""
    devs = jax.devices()
    if len(devs) < min_devices:
        log.warning(
            f"only {len(devs)} device(s), wanted >= {min_devices}"
        )
        return False
    if jax.default_backend() not in ("tpu", "cpu", "gpu"):
        log.warning(f"unknown backend {jax.default_backend()}")
        return False
    return True
