"""Device-info queries (reference src/vulkan.rs:1-80 surface)."""

import pytest

import whisper_tpu as wt


def test_device_count_positive():
    assert wt.device_count() >= 1


def test_device_description_contains_platform():
    import jax
    d = wt.device_description(0)
    assert jax.devices()[0].platform in d  # works on any backend


def test_device_index_out_of_range():
    with pytest.raises(IndexError):
        wt.device_description(10_000)
    with pytest.raises(IndexError):
        wt.device_total_memory(10_000)


def test_devices_info_structured():
    infos = wt.devices_info()
    assert len(infos) == wt.device_count()
    for e in infos:
        assert {"index", "id", "platform", "kind", "description"} <= set(e)
        if "total_memory_bytes" in e:
            assert e["total_memory_bytes"] > 0
