"""Multi-host helper tests (single-process semantics on the CPU mesh)."""

import jax
import pytest

from vk3dgaussiansplatting_tpu.parallel import multihost
from vk3dgaussiansplatting_tpu.parallel.mesh import make_mesh


def test_process_info_single():
    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())


def test_mesh_span_check():
    mesh = make_mesh()  # all devices
    multihost.assert_mesh_spans_processes(mesh)
    partial = make_mesh(4)
    with pytest.raises(ValueError):
        multihost.assert_mesh_spans_processes(partial)


def test_is_multi_process_false():
    assert not multihost.is_multi_process()
