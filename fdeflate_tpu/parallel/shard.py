"""Multi-chip stream sharding (SURVEY.md P1/P3/P4).

Independent zlib streams shard data-parallel across a device mesh: each chip
encodes/decodes its slice of the batch with the single-chip kernels, shared
tables are replicated (broadcast once by XLA), outputs gather back in stream
order, and Adler-32 folds across chips with an associative ``(A, B, len)``
combine.

Mesh layout: a 2-D mesh ``("streams", "seq")``.  The batch dimension shards
over ``streams`` (pure data parallelism; collectives only at the final
gather).  The ``seq`` axis is sequence parallelism for checksum/scan work
within a stream: each chip reduces its slice of the byte stream and partials
combine with ``ppermute``/``all_gather`` rides over ICI.
"""

from __future__ import annotations

import functools

import numpy as np


def make_mesh(shape: tuple[int, int] | None = None, devices=None):
    """Create a ("streams", "seq") mesh over the available devices."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    grid = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(grid, ("streams", "seq"))


def sharded_encode_ultrafast(mesh):
    """Batch ultra-fast encode, sharded over the ``streams`` axis.

    Returns a jitted fn(data u8[B, N], lengths i32[B]) -> (words, bits,
    adler), with B sharded across chips and results resident shard-wise.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.ultrafast_kernel import encode_ultrafast_batch

    data_s = NamedSharding(mesh, P("streams", None))
    len_s = NamedSharding(mesh, P("streams"))
    return jax.jit(
        encode_ultrafast_batch,
        in_shardings=(data_s, len_s),
        out_shardings=(data_s, len_s, len_s),
    )


def sharded_decode_symbols(mesh, max_steps: int):
    """Lane-per-stream symbol decode, sharded over ``streams``."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.inflate import decode_symbols

    fn = functools.partial(decode_symbols, max_steps=max_steps)
    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P("streams", None),  # words
            P("streams"),        # bit_pos
            P("streams"),        # bit_end
            P("streams"),        # out_pos
            P("streams"),        # active
            P("streams"),        # table_id
            P(None, None),       # litlen (replicated/broadcast)
            P(None, None),
            P(None, None),
            P(None, None),
        ),
        out_specs=(
            (P(None, "streams"),) * 5,   # records are [K, B]
            (P("streams"),) * 3,
        ),
        check_rep=False,
    )
    return jax.jit(mapped)


def checksum_tree_reduce(mesh):
    """Sequence-parallel Adler-32: per-chip partials folded over ``seq``.

    fn(data u8[B, N]) -> u32[B]: N shards over the ``seq`` axis; partial
    (A, B, len) states all-gather over ICI and fold in order (SURVEY.md P4).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.adler32 import MOD, adler32_partial_jax

    def local(data_slice):
        # data_slice: [B, N / seq] on this chip.
        a, b, n = jax.vmap(adler32_partial_jax)(data_slice, None)
        parts = jax.lax.all_gather((a, b, n), "seq")  # [seq, B]
        def fold(carry, part):
            ca, cb, cn = carry
            pa, pb, pn = part
            rem = (pn % MOD).astype(jnp.uint32)
            na = (ca + pa - 1) % MOD
            cross = (rem * ((ca - 1 + MOD) % MOD).astype(jnp.uint32)) % MOD
            nb = (cb + pb + cross.astype(jnp.int32)) % MOD
            return (na, nb, cn + pn), None
        B = a.shape[0]
        init = (jnp.ones(B, jnp.int32), jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
        (fa, fb, _), _ = jax.lax.scan(fold, init, parts)
        return (fb.astype(jnp.uint32) << 16) | fa.astype(jnp.uint32)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, "seq"),
        out_specs=P(None),
        check_rep=False,
    )
    return jax.jit(mapped)


def roundtrip_step(mesh, max_steps: int = 512, chunks: int = 4):
    """The full sharded codec step (used by multi-chip dry runs and bench).

    fn(data u8[B, N]) -> (decoded_bytes i32[B], adler u32[B], total i32):
      1. the fused codec pipeline per shard — ultra-fast encode, indexed
         C-lane chunk decode, materialize, on-device checksum verify —
         data-parallel over the ``streams`` axis;
      2. ``psum`` of verified byte counts over ``streams`` and ``pmean``
         over ``seq`` (ICI collectives).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from .device_pipeline import fused_ultrafast_roundtrip

    def local(data_slice):
        Bs, N = data_slice.shape
        step = fused_ultrafast_roundtrip(chunks, max_steps=max_steps, N=N)
        lengths = jnp.full((Bs,), N, jnp.int32)
        out, produced, ok, ck_ok = step(data_slice, lengths)
        verified = ok & ck_ok
        # Cross-chip reduction: total verified bytes over the whole mesh.
        # psum over the data-parallel axis sums distinct shards; pmean over
        # the sequence axis collapses the replicated copies (both ride ICI).
        total = jax.lax.pmean(
            jax.lax.psum(jnp.sum(jnp.where(verified, produced, 0)), "streams"),
            "seq",
        )
        from ..ops.adler32 import adler32_jax

        adler = jax.vmap(adler32_jax)(data_slice, lengths)
        return produced, adler, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P("streams", None),
        out_specs=(P("streams"), P("streams"), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def roundtrip_step_v2(mesh, chunks: int = 8, U: int | None = None,
                      collectives: bool = True):
    """Sharded codec step on the round-2 flagship engine (v2 Pallas
    pipeline): blocked ultra-fast encode -> canonical fixed-geometry
    decode -> on-device Adler verify, data-parallel over ``streams`` with
    psum/pmean verification collectives (same shape as roundtrip_step).

    fn(data u8[B, N]) -> (bpos_ok bool[B], ck_ok bool[B], total i32):
    ``total`` is the mesh-wide count of verified bytes.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from .device_pipeline import fused_ultrafast_roundtrip_v2

    def local(data_slice):
        Bs, N = data_slice.shape
        S = N // chunks
        u = U if U is not None else (32 if (S // 4) % 32 == 0 else S // 4)
        step = fused_ultrafast_roundtrip_v2(chunks, N=N, U=u)
        lengths = jnp.full((Bs,), N, jnp.int32)
        _out_sm, bpos_ok, ck_ok = step(data_slice, lengths)
        verified = bpos_ok & ck_ok
        local_total = jnp.sum(jnp.where(verified, jnp.int32(N), 0))
        if collectives:
            total = jax.lax.pmean(
                jax.lax.psum(local_total, "streams"), "seq")
        else:
            total = local_total  # see roundtrip_step_zlib docstring
        return bpos_ok, ck_ok, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P("streams", None),
        out_specs=(P("streams"), P("streams"), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def roundtrip_step_zlib(mesh, chunks: int = 8, U: int | None = None,
                        collectives: bool = True):
    """Sharded codec step over a STANDARD ZLIB artifact (round-3 headline
    pipeline): linear framed encode -> ops/repack window staging -> v2
    canonical decode -> on-device bpos + Adler verify, data-parallel over
    ``streams`` with psum/pmean verification collectives.

    fn(data u8[B, N]) -> (bpos_ok bool[B], ck_ok bool[B], total i32):
    ``total`` is the mesh-wide count of verified bytes.

    ``collectives=False`` replaces the cross-chip reduction with the
    shard-local sum (``total`` is then device 0's local count).  The two
    variants run the identical per-device program otherwise, so timing
    them against each other isolates the collectives' cost — the
    simulation-honest scaling measure on a virtual CPU mesh, where wall
    time measures host saturation instead of interconnect (bench/scaling).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.repack import stage_wwin
    from .device_pipeline import fused_zlib_roundtrip

    def local(data_slice):
        Bs, N = data_slice.shape
        S = N // chunks
        u = U if U is not None else (32 if (S // 4) % 32 == 0 else S // 4)
        step = fused_zlib_roundtrip(chunks, N, wwin=stage_wwin(S), U=u)
        lengths = jnp.full((Bs,), N, jnp.int32)
        _out_sm, bpos_ok, ck_ok = step(data_slice, lengths)
        verified = bpos_ok & ck_ok
        local_total = jnp.sum(jnp.where(verified, jnp.int32(N), 0))
        if collectives:
            total = jax.lax.pmean(
                jax.lax.psum(local_total, "streams"), "seq")
        else:
            total = local_total
        return bpos_ok, ck_ok, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P("streams", None),
        out_specs=(P("streams"), P("streams"), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def roundtrip_step_adaptive(mesh, chunks: int = 4, U: int = 8):
    """Sharded adaptive-tree codec step: on-device per-batch Huffman tree
    build -> blocked encode -> canonical decode with runtime tables ->
    verify, data-parallel over ``streams`` (each shard trains a tree on its
    own slice — the reference's per-block dynamic-table capability,
    src/compress/bitstream.rs:198-325, under the mesh).

    fn(data u8[B, N]) -> (bpos_ok bool[B], ck_ok bool[B], total i32).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from .device_pipeline import fused_adaptive_roundtrip

    def local(data_slice):
        Bs, N = data_slice.shape
        step = fused_adaptive_roundtrip(chunks, N, U=U)
        lengths = jnp.full((Bs,), N, jnp.int32)
        _out_sm, bpos_ok, ck_ok, _bits = step(data_slice, lengths)
        verified = bpos_ok & ck_ok
        total = jax.lax.pmean(
            jax.lax.psum(
                jnp.sum(jnp.where(verified, jnp.int32(N), 0)), "streams"
            ),
            "seq",
        )
        return bpos_ok, ck_ok, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P("streams", None),
        out_specs=(P("streams"), P("streams"), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def foreign_records_step(mesh, K: int = 48, U: int = 16):
    """Sharded FOREIGN (arbitrary deflate block) record decode: the
    pallas_inflate record kernel with per-lane runtime trees, lane-blocks
    data-parallel over ``streams``.  Inputs are pre-staged blocked arrays
    (windows, initial bit offsets, canonical metadata, symbol tables — see
    parallel/discovery._pallas_lane_decode for the staging recipe).

    fn(win i32[LB, wwin, 8, 128], pos0 i32[LB, 8, 128],
       meta i32[LB, 64, 8, 128], tab i32[LB, TPAIRS, 8, 128]) ->
      (bpos i32[LB, 8, 128], done i32[LB, 8, 128], eob_total i32):
    ``eob_total`` is the mesh-wide count of lanes that reached EOB.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_inflate import decode_records_blocked

    def local(win, pos0, meta, tab):
        _recs, bpos, done = decode_records_blocked(
            win, pos0, meta, tab, K=K, U=U
        )
        eob = jnp.sum((done == 1).astype(jnp.int32))
        total = jax.lax.pmean(jax.lax.psum(eob, "streams"), "seq")
        return bpos, done, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("streams", None, None, None),
            P("streams", None, None),
            P("streams", None, None, None),
            P("streams", None, None, None),
        ),
        out_specs=(P("streams", None, None), P("streams", None, None), P()),
        check_rep=False,
    )
    return jax.jit(mapped)
