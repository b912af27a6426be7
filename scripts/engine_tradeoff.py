#!/usr/bin/env python
"""Measure the device-vs-host scan-search trade under host-core pressure.

The device search/emission engines (codec/scanopt_dev.py) exist for
attachments where host cores — not the interconnect — are the scarce
resource (config.py _auto_device_scanopt). This script measures the
trade directly: pin most host cores busy, then time a group encode with
the host threaded search vs the fully-device search, on the DEFAULT
backend (the real chip when attached).

Note the CPU backend CANNOT demonstrate the win condition: there the
"device" programs run on the same saturated host cores and do ~130
candidates of work against the host search's early-exit greedy, so the
device engines always lose (measured 15x). The demonstration needs a
real accelerator, where the sweep runs on silicon the spinners can't
touch while the host search is starved.

Run: python scripts/engine_tradeoff.py        (prints both timings)
Wrapped by tests/test_deployment.py when MJ_ENGINE_TRADEOFF=1 (real
TPU required).
"""
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    if os.environ.get("MJ_TRADEOFF_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from mozjpeg_tpu import EncoderConfig, encode_many
    from mozjpeg_tpu.utils import ppm

    print("backend:", jax.default_backend())
    img = ppm.read(os.path.join(REPO, "corpus",
                                "kodak_like_768x512_1.ppm"))
    imgs = [np.roll(img, 17 * i, axis=1).copy() for i in range(4)]
    host_cfg = EncoderConfig(quality=75, deployment="remote")
    dev_cfg = EncoderConfig(quality=75, deployment="local")
    # warm both program sets (and sanity: byte-identical engines)
    a = encode_many(imgs, host_cfg)
    b = encode_many(imgs, dev_cfg)
    assert a == b, "device search output diverged from host search"

    ncores = os.cpu_count() or 4
    nbusy = max(1, ncores - 1)
    stop = threading.Event()

    def spin():
        x = 1.0
        while not stop.is_set():
            x = x * 1.0000001 + 1e-9
        return x

    spinners = [threading.Thread(target=spin, daemon=True)
                for _ in range(nbusy)]
    for t in spinners:
        t.start()
    try:
        time.sleep(0.2)
        t0 = time.perf_counter()
        encode_many(imgs, host_cfg)
        t_host = time.perf_counter() - t0
        t0 = time.perf_counter()
        encode_many(imgs, dev_cfg)
        t_dev = time.perf_counter() - t0
    finally:
        stop.set()
    print("busy cores: %d/%d" % (nbusy, ncores))
    print("host threaded search, cores saturated: %.2f s" % t_host)
    print("device search,        cores saturated: %.2f s" % t_dev)
    print("device engines %s by %.2fx"
          % ("WIN" if t_dev < t_host else "LOSE", t_host / t_dev))
    return 0 if t_dev < t_host else 1


if __name__ == "__main__":
    sys.exit(main())
