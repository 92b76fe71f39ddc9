"""Hardware validation + marginal timing of the whole-kernel linear encode.

Compares encode_ultrafast_batch(kernel_assign=True) (Pallas assign ->
pack -> DMA combine) against the XLA oracle on the chip, then times the
three encode formulations marginally.  Waits for the accelerator tunnel
if it is down (same pattern as hw_session).

Run: python bench/probe_assign.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops import ultrafast_kernel as UK

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def _ping(q):
    try:
        import jax.numpy as _jnp

        q.put(int(_jnp.sum(_jnp.arange(8))))
    except Exception:
        pass


def wait_for_tpu(poll_s: float = 60.0):
    import multiprocessing as mp

    ping = _ping
    ctx = mp.get_context("spawn")
    while True:
        q = ctx.Queue()
        p = ctx.Process(target=ping, args=(q,))
        p.start()
        p.join(90)
        ok = not p.is_alive() and not q.empty()
        if p.is_alive():
            p.terminate()
            p.join(5)
        if ok:
            stamp("TPU is up")
            return
        stamp("TPU unreachable; retrying")
        time.sleep(poll_s)


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    reps = int(os.environ.get("PB_REPS", "8"))
    wait_for_tpu()
    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C}")

    kw = dict(num_chunks=C, fixed_geometry=True, return_eof=True)
    f_asg = jax.jit(lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, kernel_pack=True, kernel_assign=True, **kw))
    f_pck = jax.jit(lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, kernel_pack=True, kernel_assign=False, **kw))

    ra = jax.block_until_ready(f_asg(d, lengths))
    stamp("assign-kernel path compiled+ran")
    rp = jax.block_until_ready(f_pck(d, lengths))
    wa, wp = np.asarray(ra[0]), np.asarray(rp[0])
    Wc = min(wa.shape[1], wp.shape[1])
    eq = wa[:, :Wc] == wp[:, :Wc]
    stamp(f"words equal: {bool(eq.all())} (mismatches {int((~eq).sum())}); "
          f"bits: {bool((np.asarray(ra[1]) == np.asarray(rp[1])).all())}; "
          f"index: {bool((np.asarray(ra[3]) == np.asarray(rp[3])).all())}")

    def fold(x):
        return jnp.sum(x.astype(jnp.int32).reshape(-1)[::997])

    def marg(name, enc):
        def make(r):
            @jax.jit
            def g(d, lengths):
                def body(k, acc):
                    d2 = d.at[0, 0].add((acc & 1).astype(d.dtype))
                    w, bits, adler, starts, eof = enc(d2, lengths)
                    return (acc + fold(w) + jnp.sum(bits)
                            + jnp.sum(adler.astype(jnp.int32)))

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        def wall(f, *args):
            _ = int(np.asarray(f(*args)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(np.asarray(f(*args)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make(1), d, lengths)
        tR = wall(make(reps), d, lengths)
        m = (tR - t1) / (reps - 1)
        stamp(f"{name}: wall(1) {t1*1e3:7.1f} ms  marginal {m*1e3:7.2f} ms"
              f"  ({B*N/m/1e9:5.2f} GB/s)")

    marg("assign+pack kernels", lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, kernel_pack=True, kernel_assign=True, **kw))
    marg("pack kernel only   ", lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, kernel_pack=True, kernel_assign=False, **kw))


if __name__ == "__main__":
    main()
