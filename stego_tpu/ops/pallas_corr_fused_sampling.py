"""Sampled contrastive-correlation loss with IN-KERNEL coordinate sampling.

The sampled loss (reference src/modules.py:287-288 + 349-398) is, per step:
bilinear-sample feats/code at random coords -> l2-normalize -> all-pairs
correlation -> clamp/shift reduction, for three pair types (self, knn-pos,
batch-derangement negatives). The round-3 path ran the sampling as XLA
matmuls (ops/sampling.py) feeding the streamed Pallas kernel
(ops/pallas_corr.py); at the feature-cache footprint that chain — weight
matrices, 14 sampling matmuls, per-tensor normalize/pad passes, gather
copies of ``orig_*[perm]`` for the negatives and their scatter-add
backward — measured ~1.4 ms of the ~2.2 ms step (TODO.md #10b).

This kernel fuses the WHOLE chain into one forward + one backward launch:

* grid ``(B, G)`` with G = 2 + neg_samples pair-slots per image, batch-major
  so the side-1 blocks (feats/code/weights of image ``b``) stay VMEM-resident
  across the G inner steps; side-1 sampling runs once per image into scratch.
* side-2 sources are fetched directly by index — the negative pairs read
  ``feats[perm_k(b)]`` via a scalar-prefetch block index map
  (``PrefetchScalarGridSpec``), so no ``orig[perm]`` gather copies exist.
* sampling, the post-sample l2-normalize, and the fd/cd correlation dots all
  happen on the block in VMEM; the only HBM artifacts are the per-slot
  accumulator rows and the backward's residuals (normalized sampled code +
  fd), each a few KB per slot.
* the backward reuses those residuals (no feature fetch, no sampling
  recompute), folds all side-1 cotangents BEFORE the single wᵀ
  back-projection per image, and emits per-slot negative-gradient panels
  that the wrapper folds with one one-hot matmul — scatter-free (TPU
  scatter-adds serialize; CLAUDE.md).

Numerics match the einsum oracle (ops/correlation.py) to f32 reassociation:
the feature side samples/correlates in ``feat_dtype`` exactly like the
XLA matmul sampler (weights cast to the tensor dtype, f32 accumulation,
bf16 round-trip before the normalize), the code side stays f32 end-to-end.
Gradients flow to the code maps only (features are stop-gradient upstream).
Dispatched for the feature-cache step via ``sampling_impl="fused"``
(train/segmenter.py); ``interpret=True`` runs it on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stego_tpu.ops.pallas_corr import _clamp_bounds, _finalize, _Static

_EPS = 1e-10  # torch F.normalize eps (reference src/modules.py:275-276)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _l2n(t: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True))
    return t / jnp.maximum(n, _EPS)


def _row_norms(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(t), axis=-1))


def _norm_jac(g: jnp.ndarray, vn: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Cotangent of ``v / max(|v|, eps)`` given the cotangent ``g`` w.r.t. the
    normalized value ``vn`` and the raw row norms ``n`` — matches jax autodiff
    of :func:`stego_tpu.ops.math.l2_normalize` (max routes the gradient to the
    constant eps branch below eps)."""
    inv = 1.0 / jnp.maximum(n, _EPS)[:, None]
    proj = vn * jnp.sum(vn * g, axis=-1, keepdims=True)
    return (g - jnp.where(n[:, None] > _EPS, proj, 0.0)) * inv


class _SampledStatic(NamedTuple):
    b: int
    g: int                     # pair slots per image: 2 + neg
    sp: int                    # padded sample rows (s*s -> mult of 128)
    npad: int                  # padded feature-map positions (H·W -> mult 16)
    cfp: int                   # padded feature channels
    st: _Static                # shifts/group_sizes/pointwise/... (reused)
    feat_dtype: object


# ----------------------------------------------------------------------
# forward


def _sfwd_kernel(i2_ref, w1_ref, w2_ref, f1_ref, f2_ref, c1_ref, c2_ref,
                 acc_ref, z2cn_ref, fd_ref, z1f_scr, z1c_scr,
                 *, lo, hi, fdt):
    """acc rows: 0=s1, 1=s2, 2=s3, 3=cd_sum, 4=side2 raw code norms."""
    del i2_ref  # consumed by the block index maps
    gi = pl.program_id(1)
    bf16 = fdt == jnp.bfloat16

    def sample_feats(w, f_ref):
        z = jax.lax.dot_general(
            w.astype(fdt), f_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bf16:  # XLA sampler parity: sampled values round to bf16 first
            z = z.astype(fdt).astype(jnp.float32)
        return _l2n(z).astype(fdt)

    @pl.when(gi == 0)
    def _():
        w1 = w1_ref[0]
        z1f_scr[...] = sample_feats(w1, f1_ref)
        z1c = jax.lax.dot_general(w1, c1_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        z1c_scr[...] = _l2n(z1c)

    w2 = w2_ref[0]
    z2fn = sample_feats(w2, f2_ref)
    z2c = jax.lax.dot_general(w2, c2_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    n2 = _row_norms(z2c)
    z2cn = z2c / jnp.maximum(n2, _EPS)[:, None]

    fd = jax.lax.dot_general(z1f_scr[...], z2fn, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cd = jax.lax.dot_general(z1c_scr[...], z2cn, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cdc = jnp.clip(cd, lo, hi)
    acc_ref[0, 0] = jnp.sum(cdc * fd, axis=1)
    acc_ref[0, 1] = jnp.sum(cdc, axis=1)
    acc_ref[0, 2] = jnp.sum(fd, axis=1)
    acc_ref[0, 3] = jnp.sum(cd, axis=1)
    acc_ref[0, 4] = n2
    acc_ref[0, 5:] = jnp.zeros_like(acc_ref[0, 5:])
    z2cn_ref[0] = z2cn
    fd_ref[0] = fd


def _run_sfwd(w, f, c, i2, ss: _SampledStatic):
    lo, hi = _clamp_bounds(ss.st)
    b, g, sp = ss.b, ss.g, ss.sp
    np_ = f.shape[1]
    cf, cc = f.shape[2], c.shape[2]

    side1 = lambda bb, gi, i2r: (bb, 0, 0)
    w2idx = lambda bb, gi, i2r: (jnp.where(gi == 0, bb, b + bb), 0, 0)
    side2 = lambda bb, gi, i2r: (i2r[bb * g + gi], 0, 0)
    slot = lambda bb, gi, i2r: (bb * g + gi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, sp, np_), side1, memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, sp, np_), w2idx, memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, np_, cf), side1, memory_space=pltpu.VMEM),  # f1
            pl.BlockSpec((1, np_, cf), side2, memory_space=pltpu.VMEM),  # f2
            pl.BlockSpec((1, np_, cc), side1, memory_space=pltpu.VMEM),  # c1
            pl.BlockSpec((1, np_, cc), side2, memory_space=pltpu.VMEM),  # c2
        ],
        out_specs=[
            pl.BlockSpec((1, 8, sp), slot, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, cc), slot, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, sp), slot, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sp, cf), ss.feat_dtype),
            pltpu.VMEM((sp, cc), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sfwd_kernel, lo=lo, hi=hi, fdt=ss.feat_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * g, 8, sp), jnp.float32),
            jax.ShapeDtypeStruct((b * g, sp, cc), jnp.float32),
            jax.ShapeDtypeStruct((b * g, sp, sp), jnp.float32),
        ],
        interpret=ss.st.interpret,
    )(i2, w, w, f, f, c, c)


# ----------------------------------------------------------------------
# backward


def _sbwd_kernel(w1_ref, w2_ref, z1cn_ref, z2cn_ref, fd_ref, acc_ref,
                 acc0_ref, sc_ref, dc1_ref, dcp_ref, dcn_ref, dz1_scr,
                 *, lo, hi, pointwise, g, inv_n):
    gi = pl.program_id(1)
    g_loss = sc_ref[0, 0, 0]
    g_cdm = sc_ref[0, 0, 1]
    gm = sc_ref[0, 0, 2]
    shift = sc_ref[0, 0, 3]
    inv_m = sc_ref[0, 0, 4]

    z1cn = z1cn_ref[0]
    z2cn = z2cn_ref[0]
    cd = jax.lax.dot_general(z1cn, z2cn, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    fd = fd_ref[0]
    mask = ((cd >= lo) & (cd <= hi)).astype(jnp.float32)
    if pointwise:
        rowmean = acc_ref[0, 2] * inv_n
        fdp = fd - rowmean[:, None] + gm
    else:
        fdp = fd
    coeff = (-(fdp - shift) * mask * g_loss + g_cdm) * inv_m  # (Sp, Sp)

    @pl.when(gi == 0)
    def _():
        dz1_scr[...] = jnp.zeros_like(dz1_scr)

    dz1_scr[...] += jnp.dot(coeff, z2cn, preferred_element_type=jnp.float32)
    # side-2 cotangent: coeffᵀ @ z1cn
    dz2 = jax.lax.dot_general(coeff, z1cn, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(gi == 0)
    def _():
        # the self pair's side 2 IS the side-1 tensor: fold its raw cotangent
        # into the side-1 accumulator (Jacobian + wᵀ applied once, at flush)
        dz1_scr[...] += dz2

    @pl.when(gi >= 1)
    def _():
        n2 = acc_ref[0, 4]
        dz2j = _norm_jac(dz2, z2cn, n2)
        dc2 = jax.lax.dot_general(w2_ref[0], dz2j, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(gi == 1)
        def _():
            dcp_ref[0] = dc2

        if dcn_ref is not None:
            @pl.when(gi >= 2)
            def _():
                dcn_ref[0] = dc2

    @pl.when(gi == g - 1)
    def _():
        n1 = acc0_ref[0, 4]  # slot (b, 0)'s side 2 == side 1
        dz1j = _norm_jac(dz1_scr[...], z1cn, n1)
        dc1_ref[0] = jax.lax.dot_general(
            w1_ref[0], dz1j, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _run_sbwd(w, z2cn, fd, acc, scalars, ss: _SampledStatic):
    lo, hi = _clamp_bounds(ss.st)
    b, g, sp = ss.b, ss.g, ss.sp
    np_ = w.shape[2]
    cc = z2cn.shape[2]
    neg = g - 2

    side1 = lambda bb, gi: (bb, 0, 0)
    w2idx = lambda bb, gi: (jnp.where(gi == 0, bb, b + bb), 0, 0)
    slot = lambda bb, gi: (bb * g + gi, 0, 0)
    slot0 = lambda bb, gi: (bb * g, 0, 0)
    negslot = lambda bb, gi: (jnp.where(gi >= 2, (gi - 2) * b + bb, bb), 0, 0)

    in_specs = [
        pl.BlockSpec((1, sp, np_), side1, memory_space=pltpu.VMEM),   # w1
        pl.BlockSpec((1, sp, np_), w2idx, memory_space=pltpu.VMEM),   # w2
        pl.BlockSpec((1, sp, cc), slot0, memory_space=pltpu.VMEM),    # z1cn
        pl.BlockSpec((1, sp, cc), slot, memory_space=pltpu.VMEM),     # z2cn
        pl.BlockSpec((1, sp, sp), slot, memory_space=pltpu.VMEM),     # fd
        pl.BlockSpec((1, 8, sp), slot, memory_space=pltpu.VMEM),      # acc
        pl.BlockSpec((1, 8, sp), slot0, memory_space=pltpu.VMEM),     # acc0
        pl.BlockSpec((1, 1, 8), slot, memory_space=pltpu.SMEM),       # scalars
    ]
    out_specs = [
        pl.BlockSpec((1, np_, cc), side1, memory_space=pltpu.VMEM),   # dC1
        pl.BlockSpec((1, np_, cc), side1, memory_space=pltpu.VMEM),   # dCpos
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, np_, cc), jnp.float32),
        jax.ShapeDtypeStruct((b, np_, cc), jnp.float32),
    ]
    if neg > 0:
        out_specs.append(
            pl.BlockSpec((1, np_, cc), negslot, memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((neg * b, np_, cc), jnp.float32))
        kern = functools.partial(_sbwd_kernel, lo=lo, hi=hi,
                                 pointwise=ss.st.pointwise, g=g,
                                 inv_n=1.0 / ss.st.n_real)
    else:
        def kern(*refs, **kw):
            *ins, dc1, dcp, dz1 = refs
            return _sbwd_kernel(*ins, dc1, dcp, None, dz1, lo=lo, hi=hi,
                                pointwise=ss.st.pointwise, g=g,
                                inv_n=1.0 / ss.st.n_real)

    out = pl.pallas_call(
        kern,
        grid=(b, g),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((sp, cc), jnp.float32)],
        interpret=ss.st.interpret,
    )(w, w, z2cn, z2cn, fd, acc, acc, scalars)
    if neg > 0:
        return out[0], out[1], out[2]
    return out[0], out[1], None


# ----------------------------------------------------------------------
# custom-vjp core


def _slot_to_group(acc_like: jnp.ndarray, ss: _SampledStatic) -> jnp.ndarray:
    """(B·G, ...) slot-major -> (G·B, ...) group-major (matches _finalize's
    contiguous group layout: self rows, pos rows, then negatives k-major)."""
    b, g = ss.b, ss.g
    return acc_like.reshape((b, g) + acc_like.shape[1:]).swapaxes(0, 1) \
        .reshape((b * g,) + acc_like.shape[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sampled_core(w, f, c, i2, ss: _SampledStatic):
    acc, _, _ = _run_sfwd(w, f, c, i2, ss)
    accg = _slot_to_group(acc, ss)
    losses, cd_means, _, _ = _finalize(accg[:, 0], accg[:, 1], accg[:, 2],
                                       accg[:, 3], ss.st)
    return losses, cd_means


def _sampled_core_fwd(w, f, c, i2, ss: _SampledStatic):
    acc, z2cn, fd = _run_sfwd(w, f, c, i2, ss)
    accg = _slot_to_group(acc, ss)
    losses, cd_means, _, gm_b = _finalize(accg[:, 0], accg[:, 1], accg[:, 2],
                                          accg[:, 3], ss.st)
    # per-GROUP mean of fd (gm_b is group-broadcast (G·B,); one row per group)
    # per-group fd means: one group per pair slot type (self, pos, neg_k...)
    gm = gm_b[jnp.arange(ss.g, dtype=jnp.int32) * ss.b]
    return (losses, cd_means), (w, z2cn, fd, acc, gm, i2)


def _sampled_core_bwd(ss: _SampledStatic, residuals, cots):
    w, z2cn, fd, acc, gm, i2 = residuals
    g_losses, g_cdms = cots
    b, g = ss.b, ss.g
    neg = g - 2

    # per-slot SMEM scalars, slot order (b-major): slot (b, gi) belongs to
    # group gi (one group per pair slot type — the reference recenters fd
    # with a separate mean per helper() call, modules.py:331-333)
    grp = jnp.arange(g, dtype=jnp.int32)
    inv_m = jnp.asarray(
        [1.0 / (gs * ss.st.n_real * ss.st.n_real)
         for gs in ss.st.group_sizes], jnp.float32)
    shifts = jnp.asarray(ss.st.shifts, jnp.float32)
    rows = jnp.stack([g_losses[grp], g_cdms[grp], gm[grp], shifts[grp],
                      inv_m[grp], jnp.zeros_like(grp, jnp.float32),
                      jnp.zeros_like(grp, jnp.float32),
                      jnp.zeros_like(grp, jnp.float32)], axis=-1)  # (G, 8)
    scalars = jnp.broadcast_to(rows[None], (b, g, 8)) \
        .reshape(b * g, 1, 8).astype(jnp.float32)

    dc1, dcp, dcn = _run_sbwd(w, z2cn, fd, acc, scalars, ss)

    dcode = dc1
    if neg > 0:
        # negatives: slot (k, b) wrote its panel to row k·B+b; fold into the
        # base rows with ONE one-hot contraction (TPU scatter-add serializes)
        p_all = i2.reshape(b, g)[:, 2:].swapaxes(0, 1).reshape(-1)  # (neg·B,)
        onehot = (p_all[None, :] == jnp.arange(b)[:, None]).astype(jnp.float32)
        folded = jax.lax.dot_general(
            onehot, dcn.reshape(neg * b, -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dcode = dcode + folded.reshape(dc1.shape)

    dc = jnp.concatenate([dcode, dcp], axis=0)
    return (jnp.zeros_like(w),
            jnp.zeros((2 * b, ss.npad, ss.cfp), ss.feat_dtype), dc,
            np.zeros(i2.shape, jax.dtypes.float0))


_sampled_core.defvjp(_sampled_core_fwd, _sampled_core_bwd)


# ----------------------------------------------------------------------
# public API


def sampled_corr_fused(
    orig_feats: jnp.ndarray,
    orig_feats_pos: jnp.ndarray,
    orig_code: jnp.ndarray,
    orig_code_pos: jnp.ndarray,
    coords1: jnp.ndarray,
    coords2: jnp.ndarray,
    perms: Sequence[jnp.ndarray],
    shifts: Sequence[float],
    pointwise: bool = True,
    zero_clamp: bool = True,
    stabalize: bool = False,
    feat_dtype=jnp.float32,
    interpret: bool | None = None,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three-pair sampled correlation loss, sampling fused into the kernel.

    Args mirror the reference's loss inputs (src/modules.py:349-367): NHWC
    dense maps, ``coords*`` are (B, S1, S2, 2) normalized grids in torch
    (x, y) order as drawn by ``_draw_coords``, ``perms`` the negative
    batch derangements, ``shifts`` one entry PER GROUP (2 + len(perms):
    self, knn-pos, then each negative — each negative is its own group so
    the pointwise recenter uses a per-k fd mean exactly like the
    reference's per-call ``fd.mean()``). Returns (losses (G,),
    cd_means (G,)) equal to the einsum oracle's per-pair ``loss.mean()`` /
    ``cd.mean()``.

    ``mesh``: on a >1-device mesh the kernel runs per batch shard via
    shard_map (round 5). The perms MUST then be shard-local (block-diagonal
    over mesh-size contiguous blocks — ``negatives_scope=local``,
    ops/math.py:block_local_super_perm): every negative's source row lives on
    the reading device, so the scalar-prefetch index maps stay collective-free
    and the per-shard results assemble into the exact single-device
    block-diagonal loss (mean of equal-sized shard means).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from stego_tpu.ops.sampling import bilinear_sample_weights

    b, h, wdt, cf = orig_feats.shape
    cc = orig_code.shape[-1]
    s = coords1.shape[1] * coords1.shape[2]
    neg = len(perms)
    g = 2 + neg
    sp = _round_up(s, 128)
    np_ = _round_up(h * wdt, 16)
    cfp = _round_up(cf, 128)
    ccp = _round_up(cc, 128)

    # sample_from_coords parity: the reference transposes the grid's spatial
    # axes before grid_sample (src/modules.py:287)
    g1 = jnp.transpose(coords1, (0, 2, 1, 3))
    g2 = jnp.transpose(coords2, (0, 2, 1, 3))
    w1 = bilinear_sample_weights((h, wdt), g1).astype(jnp.float32)
    w2 = bilinear_sample_weights((h, wdt), g2).astype(jnp.float32)
    pad_w = ((0, 0), (0, sp - s), (0, np_ - h * wdt))
    w1 = jnp.pad(w1, pad_w)
    w2 = jnp.pad(w2, pad_w)

    def prep(t, cp, dt):
        t = t.reshape(b, h * wdt, t.shape[-1]).astype(dt)
        return jnp.pad(t, ((0, 0), (0, np_ - h * wdt), (0, cp - t.shape[-1])))

    f1 = jax.lax.stop_gradient(prep(orig_feats, cfp, feat_dtype))
    f2 = jax.lax.stop_gradient(prep(orig_feats_pos, cfp, feat_dtype))
    c1 = prep(orig_code, ccp, jnp.float32)
    c2 = prep(orig_code_pos, ccp, jnp.float32)

    assert len(shifts) == g, (len(shifts), g)

    def make_static(bloc: int) -> _SampledStatic:
        st = _Static(
            shifts=tuple(float(x) for x in shifts),
            group_sizes=(bloc,) * g,
            pointwise=bool(pointwise), zero_clamp=bool(zero_clamp),
            stabalize=bool(stabalize), n_real=s, interpret=bool(interpret),
            mesh=None, code_bf16=False,
        )
        return _SampledStatic(b=bloc, g=g, sp=sp, npad=np_, cfp=cfp, st=st,
                              feat_dtype=feat_dtype)

    def core(w1x, w2x, f1x, f2x, c1x, c2x, perm_rows):
        """Single-device kernel body; ``perm_rows`` (neg, bloc) LOCAL indices."""
        bloc = f1x.shape[0]
        w = jnp.concatenate([w1x, w2x], axis=0)
        f = jnp.concatenate([f1x, f2x], axis=0)
        c = jnp.concatenate([c1x, c2x], axis=0)
        cols = [jnp.arange(bloc, dtype=jnp.int32),
                jnp.arange(bloc, dtype=jnp.int32) + bloc]
        cols += [perm_rows[k] for k in range(neg)]
        i2 = jnp.stack(cols, axis=1).reshape(-1)  # (bloc·G,) slot-major
        return _sampled_core(w, f, c, i2, make_static(bloc))

    perm_arr = (jnp.stack([p.astype(jnp.int32) for p in perms])
                if neg else jnp.zeros((0, b), jnp.int32))

    if mesh is None or mesh.devices.size <= 1:
        return core(w1, w2, f1, f2, c1, c2, perm_arr)

    from jax.sharding import PartitionSpec as P

    from stego_tpu.parallel.mesh import DATA_AXIS

    d = mesh.devices.size
    if b % d:
        raise ValueError(f"fused-sampling batch {b} not divisible by mesh "
                         f"size {d}")

    def per_shard(w1l, w2l, f1l, f2l, c1l, c2l, perml):
        bloc = f1l.shape[0]
        off = jax.lax.axis_index(DATA_AXIS) * bloc
        losses, cds = core(w1l, w2l, f1l, f2l, c1l, c2l, perml - off)
        return losses[None], cds[None]

    spec = P(DATA_AXIS)
    losses_d, cds_d = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec,) * 6 + (P(None, DATA_AXIS),),
        out_specs=(spec, spec), check_vma=False,
    )(w1, w2, f1, f2, c1, c2, perm_arr)
    # global per-group loss = mean of the equal-sized shard means
    return jnp.mean(losses_d, axis=0), jnp.mean(cds_d, axis=0)
