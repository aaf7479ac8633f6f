"""Accelerator device queries.

TPU-native equivalent of the reference's Vulkan device-info surface
(src/vulkan.rs:1-80: get_vulkan_device_count / get_vulkan_device_description /
get_vulkan_device_total_vram) and the ggml backend-registry device scan
(src/whisper.cpp:1320-1352). Here the "registry" is jax.devices(); HBM
numbers come from the runtime's memory_stats when the backend exposes them.
"""

from __future__ import annotations

from typing import Dict, List, Optional


def device_count() -> int:
    """Number of visible accelerator devices (vulkan.rs get_vulkan_device_count)."""
    import jax

    return jax.device_count()


def device_description(index: int = 0) -> str:
    """Human-readable device description (vulkan.rs get_vulkan_device_description)."""
    import jax

    devs = jax.devices()
    if not 0 <= index < len(devs):
        raise IndexError(f"device index {index} out of range (0..{len(devs) - 1})")
    d = devs[index]
    return f"{d.platform}:{d.device_kind} (id={d.id}, process={d.process_index})"


def device_total_memory(index: int = 0) -> Optional[int]:
    """Total on-device memory in bytes, or None when the backend doesn't
    report it (vulkan.rs get_vulkan_device_total_vram). CPU devices and
    relayed TPUs may not expose memory_stats."""
    import jax

    devs = jax.devices()
    if not 0 <= index < len(devs):
        raise IndexError(f"device index {index} out of range (0..{len(devs) - 1})")
    try:
        stats = devs[index].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def devices_info() -> List[Dict]:
    """One dict per device: the whisper.cpp startup device-scan log
    (src/whisper.cpp:1330-1346 "found device ...") as structured data."""
    import jax

    out = []
    for i, d in enumerate(jax.devices()):
        # one memory_stats() round trip per device; total/used both derive
        # from the same dict (relayed TPUs/CPU may not expose stats at all)
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        total = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        entry = {
            "index": i,
            "id": d.id,
            "platform": d.platform,
            "kind": d.device_kind,
            "process_index": d.process_index,
            "description": (f"{d.platform}:{d.device_kind} "
                            f"(id={d.id}, process={d.process_index})"),
        }
        if total is not None:
            entry["total_memory_bytes"] = total
            used = stats.get("bytes_in_use")
            if used is not None:
                entry["free_memory_bytes"] = max(total - used, 0)
        out.append(entry)
    return out
