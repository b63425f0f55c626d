"""DevicePrefetcher: ordering, sharding, error propagation, shutdown."""

import numpy as np
import pytest

from hpfg_tpu.data.prefetch import DevicePrefetcher
from hpfg_tpu.parallel.mesh import get_mesh


def _batches(n, bs=8):
    for i in range(n):
        yield {"image": np.full((bs, 4, 4, 1), i, np.float32),
               "label": np.full((bs, 4, 4), i, np.int32)}


class TestDevicePrefetcher:
    def test_yields_all_batches_in_order(self):
        mesh = get_mesh()
        pf = DevicePrefetcher(_batches(5), mesh, depth=2)
        seen = [float(np.asarray(b["image"]).ravel()[0]) for b in pf]
        assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]

    def test_batches_arrive_sharded(self):
        import jax

        mesh = get_mesh()
        pf = DevicePrefetcher(_batches(1), mesh, depth=2)
        batch = next(pf)
        assert isinstance(batch["image"], jax.Array)
        if mesh.devices.size > 1:
            assert len(batch["image"].sharding.device_set) == mesh.devices.size
        with pytest.raises(StopIteration):
            next(pf)

    def test_worker_error_propagates(self):
        def bad():
            yield {"image": np.zeros((8, 4, 4, 1), np.float32)}
            raise RuntimeError("loader blew up")

        pf = DevicePrefetcher(bad(), get_mesh(), depth=2)
        next(pf)
        with pytest.raises(RuntimeError) as ei:
            next(pf)
        assert "loader blew up" in str(ei.value.__cause__)

    def test_close_unblocks_worker(self):
        pf = DevicePrefetcher(_batches(100), get_mesh(), depth=1)
        next(pf)
        pf.close()
        pf._thread.join(timeout=5)
        assert not pf._thread.is_alive()
