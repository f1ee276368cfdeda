"""Native runtime tests (native/ocs2rt.cpp via ctypes): seqlock policy store
(reference BufferedValue/Synchronized semantics, ocs2_core/test/
thread_support/testBufferedValue.cpp, testSynchronized.cpp), policy
serialization (mpc_flattened_controller analogue), and rate loops."""
import threading

import numpy as np
import pytest

from ocs2_tpu.runtime.native import (
    PolicyStore,
    RateLoop,
    monotonic_time,
)
from ocs2_tpu.runtime.serialization import (
    flatten_linear_policy,
    flatten_policy,
    unflatten_policy,
)


class TestSerialization:
    def test_roundtrip(self):
        arrays = {
            "times": np.linspace(0, 1, 11).astype(np.float32),
            "xs": np.random.default_rng(0).normal(size=(11, 4)).astype(np.float32),
            "gains": np.zeros((10, 2, 4), np.float32),
            "modes": np.array([0, 1, 1], np.int32),
        }
        out = unflatten_policy(flatten_policy(arrays))
        assert set(out) == set(arrays)
        for k in arrays:
            np.testing.assert_array_equal(out[k], arrays[k])
            assert out[k].dtype == arrays[k].dtype

    def test_linear_policy_packer(self):
        blob = flatten_linear_policy(
            times=np.zeros(5), xs=np.zeros((5, 2)), us=np.zeros((4, 1)),
            gains=np.zeros((4, 1, 2)),
        )
        out = unflatten_policy(blob)
        assert out["gains"].shape == (4, 1, 2)


class TestPolicyStore:
    def test_write_read_only_new(self):
        s = PolicyStore(1 << 12)
        assert s.read() is None
        s.write(b"abc")
        assert s.read() == b"abc"
        assert s.read() is None  # unchanged
        s.write(b"def")
        assert s.read() == b"def"
        s.close()

    def test_capacity_enforced(self):
        s = PolicyStore(16)
        with pytest.raises(ValueError):
            s.write(b"x" * 32)
        s.close()

    def test_shared_memory_cross_handle(self):
        w = PolicyStore(4096, name="/ocs2rt_pytest", create=True)
        r = PolicyStore(4096, name="/ocs2rt_pytest", create=False)
        w.write(b"policy-blob")
        assert r.read() == b"policy-blob"
        r.close()
        w.close(unlink=True)

    def test_no_torn_reads_under_concurrency(self):
        """Seqlock invariant: a reader never observes a half-written blob
        (the property BufferedValue/Synchronized provide in the reference)."""
        s = PolicyStore(1 << 12)
        stop = threading.Event()

        def writer():
            i = 0
            while not stop.is_set():
                s.write(np.full(128, i % 251, np.float64).tobytes())
                i += 1

        t = threading.Thread(target=writer)
        t.start()
        torn = 0
        for _ in range(5000):
            blob = s.read(only_new=False)
            if blob:
                a = np.frombuffer(blob, np.float64)
                if not np.all(a == a[0]):
                    torn += 1
        stop.set()
        t.join()
        s.close()
        assert torn == 0


class TestRateLoop:
    def test_rate_accuracy(self):
        loop = RateLoop(500.0)
        t0 = monotonic_time()
        n = 25
        for _ in range(n):
            loop.wait()
        elapsed = monotonic_time() - t0
        # 25 ticks at 500 Hz = 50 ms; allow generous CI jitter upward.
        assert elapsed >= 0.045
        assert elapsed < 0.5
        assert loop.ticks == n
