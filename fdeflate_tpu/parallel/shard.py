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


def roundtrip_step(mesh, max_steps: int = 512):
    """The full sharded codec step (used by multi-chip dry runs and bench).

    fn(data u8[B, N]) -> (decoded u8[B, *], total_bytes i32):
      1. ultra-fast encode the batch (sharded over ``streams``);
      2. symbol-decode the encoded streams on the same shards;
      3. sequence-parallel checksum with cross-chip combine over ``seq``;
      4. ``psum`` the byte counts over both axes (ICI collective).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..huffman import FIXED_LITLEN_TABLE  # noqa: F401 (table warmup)
    from ..ops.inflate import decode_symbols
    from ..ops.ultrafast_kernel import encode_ultrafast_batch
    from ..models.ultrafast import STREAM_HEADER_BITS
    from ..ops import inflate as I

    # Trained-tree decode tables, shared by every ultra-fast stream.
    from ..huffman import build_table
    from ..tables import (
        DEFAULT_DIST_TABLE_SIZE,
        DEFAULT_LITLEN_TABLE_SIZE,
        DISTANCE_TABLE_ENTRIES,
        HUFFMAN_LENGTHS,
        LITLEN_TABLE_ENTRIES,
    )

    litlen = build_table(
        HUFFMAN_LENGTHS, LITLEN_TABLE_ENTRIES, DEFAULT_LITLEN_TABLE_SIZE,
        is_distance_table=False, double_literal=True,
    )
    dist_lengths = np.zeros(32, np.int64)
    dist_lengths[0] = 1
    dist = build_table(
        dist_lengths, DISTANCE_TABLE_ENTRIES, DEFAULT_DIST_TABLE_SIZE,
        is_distance_table=True, double_literal=False,
    )
    tables_np = (
        litlen.primary[None].astype(np.uint32),
        (litlen.secondary if len(litlen.secondary) else np.zeros(1, np.uint16))[None].astype(np.uint32),
        dist.primary[None].astype(np.uint32),
        (dist.secondary if len(dist.secondary) else np.zeros(1, np.uint16))[None].astype(np.uint32),
    )

    def local(data_slice):
        import jax.numpy as jnp

        Bs, N = data_slice.shape
        lengths = jnp.full((Bs,), N, jnp.int32)
        words, total_bits, adler = encode_ultrafast_batch(data_slice, lengths)

        t = [jnp.asarray(x) for x in tables_np]
        records, (bpos, opos, status) = decode_symbols(
            words,
            jnp.full((Bs,), STREAM_HEADER_BITS, jnp.int32),
            total_bits,
            jnp.zeros((Bs,), jnp.int32),
            jnp.ones((Bs,), bool),
            jnp.zeros((Bs,), jnp.int32),
            t[0], t[1], t[2], t[3],
            max_steps=max_steps,
        )
        decoded_bytes = opos
        ok = status == I._EOB
        # Cross-chip reduction: total decoded bytes over the whole mesh.
        # psum over the data-parallel axis sums distinct shards; pmean over
        # the sequence axis collapses the replicated copies (both ride ICI).
        total = jax.lax.pmean(
            jax.lax.psum(jnp.sum(jnp.where(ok, decoded_bytes, 0)), "streams"),
            "seq",
        )
        return decoded_bytes, adler, total

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=P("streams", None),
        out_specs=(P("streams"), P("streams"), P()),
        check_rep=False,
    )
    return jax.jit(mapped)
