"""Worker process for tests/test_multihost.py.

Invoked as: python multihost_worker.py <coordinator> <nprocs> <pid>
            <mode> <in.npy> <out_prefix>

Connects to the 2-process CPU runtime (4 virtual devices per process,
set via env by the parent), runs the requested multi-host encoder, and
writes its local result bytes to <out_prefix>.<pid>.<i>.jpg.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    coord, nprocs, pid, mode, inpath, outpref = sys.argv[1:7]
    nprocs, pid = int(nprocs), int(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coord, nprocs, pid)
    assert jax.process_count() == nprocs
    assert jax.default_backend() == "cpu"

    from mozjpeg_tpu.parallel import multihost

    data = np.load(inpath)
    if mode == "batch":
        bl = data.shape[0] // nprocs
        local = data[pid * bl:(pid + 1) * bl]
        outs = multihost.encode_batch_multihost(local, quality=75.0)
        for i, b in enumerate(outs):
            with open("%s.%d.%d.jpg" % (outpref, pid, i), "wb") as f:
                f.write(b)
    elif mode == "rows":
        out = multihost.encode_row_sharded_multihost(
            data, quality=75.0, restart_rows=1)
        with open("%s.%d.0.jpg" % (outpref, pid), "wb") as f:
            f.write(out)
    elif mode == "batch_default":
        bl = data.shape[0] // nprocs
        local = data[pid * bl:(pid + 1) * bl]
        outs = multihost.encode_batch_multihost_default(
            list(local), quality=75.0)
        for i, b in enumerate(outs):
            with open("%s.%d.%d.jpg" % (outpref, pid, i), "wb") as f:
                f.write(b)
    elif mode in ("trellis", "progressive", "scanopt"):
        fn = {"trellis": multihost.encode_row_sharded_trellis_multihost,
              "progressive":
                  multihost.encode_row_sharded_progressive_multihost,
              "scanopt": multihost.encode_row_sharded_scanopt_multihost,
              }[mode]
        out = fn(data, quality=75.0, restart_rows=1)
        with open("%s.%d.0.jpg" % (outpref, pid), "wb") as f:
            f.write(out)
    else:
        raise SystemExit("unknown mode " + mode)
    # all processes must stay alive until every collective finished
    jax.effects_barrier()


if __name__ == "__main__":
    main()
