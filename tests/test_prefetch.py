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

    def test_wire_compression_roundtrip(self):
        import jax.numpy as jnp

        from hpfg_tpu.data.prefetch import (compress_wire,
                                            restore_wire_dtypes)

        batch = {"image": np.linspace(-2, 2, 32, dtype=np.float32),
                 "label": np.array([0, 3, 255], np.int32),
                 "index": np.array([0, 70000], np.int64),
                 "half": np.ones(4, np.float16)}
        wire = compress_wire(batch)
        assert wire["image"].dtype == np.float16
        assert wire["label"].dtype == np.uint8      # 255 ignore fits
        # int compression is keyed STATICALLY by name (ADVICE r2): a
        # non-label int field keeps its dtype regardless of its values —
        # value-dependent wire dtypes would flip across batches and silently
        # retrigger the donated step's multi-minute recompile
        assert wire["index"].dtype == np.int64
        restored = restore_wire_dtypes(
            {k: jnp.asarray(v) for k, v in wire.items()})
        assert restored["image"].dtype == jnp.float32
        assert restored["label"].dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(restored["label"]),
                                      batch["label"])
        np.testing.assert_allclose(np.asarray(restored["image"]),
                                   batch["image"], atol=2e-3)

    def test_wire_compression_rejects_out_of_range_labels(self):
        from hpfg_tpu.data.prefetch import compress_wire

        with pytest.raises(ValueError, match="outside"):
            compress_wire({"label": np.array([0, 70000], np.int64)})

    def test_wire_compression_only_touches_class_id_keys(self):
        # int fields that merely CONTAIN 'label' (e.g. a global sample
        # index) are not class ids: they must pass through uncompressed
        # instead of crashing the [0, 255] range check
        from hpfg_tpu.data.prefetch import compress_wire

        wire = compress_wire({"labeled_idx": np.array([0, 70000], np.int64)})
        assert wire["labeled_idx"].dtype == np.int64

    def test_prefetcher_compresses_by_default(self):
        pf = DevicePrefetcher(_batches(1), get_mesh(), depth=2)
        batch = next(pf)
        assert str(batch["image"].dtype) == "float16"
        assert str(batch["label"].dtype) == "uint8"

    def test_close_unblocks_worker(self):
        pf = DevicePrefetcher(_batches(100), get_mesh(), depth=1)
        next(pf)
        pf.close()
        pf._thread.join(timeout=5)
        assert not pf._thread.is_alive()
