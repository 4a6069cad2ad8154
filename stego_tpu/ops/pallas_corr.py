"""Fused contrastive-correlation loss as a Pallas TPU kernel.

The reference materializes per-pair correspondence tensors
``B x H x W x I x J`` (src/modules.py:283-284,325-347) — O((HW)^2) memory that
forces it to subsample 11x11 coordinates. This kernel streams the computation
flash-attention-style: for each (batch, row-tile) it loops over column tiles,
computing the feature- and code-correlation tiles on the MXU and reducing them
into per-row accumulators in VMEM. **No N x N tensor ever reaches HBM**, making
full-field (HW x HW) correspondence loss tractable (SURVEY.md §5 — this is the
repo's "ring-attention equivalent").

Math (identical to ops/correlation.py, the einsum oracle):
    fd = f̂1 @ f̂2ᵀ   (stop-grad)        cd = ĉ1 @ ĉ2ᵀ
    pointwise:  fd' = fd - rowmean_j(fd) + groupmean(fd)
    loss = mean( -clamp(cd) * (fd' - shift) )

The streaming trick: with per-row partial sums
    s1 = Σ_j clamp(cd)·fd,   s2 = Σ_j clamp(cd),   s3 = Σ_j fd
the total loss is a closed form in (s1, s2, s3) — a single pass suffices, and
the tiny (B, N) reductions finalize in plain XLA.

ALL pair types (self, knn-pos, and the stacked batch-derangement negatives)
run in ONE kernel launch: pairs are concatenated along the batch dimension and
per-pair-type quantities (shift, group mean, loss cotangent) enter the
backward kernel as per-batch-row SMEM scalars — 2 launches total
(1 fwd + 1 merged bwd that computes both code gradients from one dL/dcd
tile recomputation) per step. Measured steady-state on v5e (ViT-S/8, res 224,
batch 16): sampled-11x11 via this kernel matches the einsum path (~52 ms/step)
and FULL-FIELD mode — seven dense 784x784 correspondence fields per step —
costs only ~12 ms more (64 ms/step, 249 imgs/sec/chip).

Backward recomputes fd/cd tiles (never stored) and contracts the analytic
dL/dcd against ĉ2 / ĉ1; residuals are just the (B, N) rowmeans + per-group
scalars. Gradients flow to the code path only (features are frozen upstream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stego_tpu.ops.math import l2_normalize

TQ = 128  # row tile
TK = 128  # column tile
NEG_INF_MIN = -9999.0  # reference's "no clamp" lower bound (modules.py:340)


def _pad_axis(x: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


class _Static(NamedTuple):
    shifts: Tuple[float, ...]       # one per pair-type group
    group_sizes: Tuple[int, ...]    # batch rows per group (sum = B_all)
    pointwise: bool
    zero_clamp: bool
    stabalize: bool
    n_real: int
    interpret: bool
    mesh: object = None             # jax Mesh (hashable): >1 device runs the
                                    # kernels per batch shard via shard_map
    code_bf16: bool = False         # cast code tiles to bf16 INSIDE the
                                    # kernels (f32 accum): primals/grads stay
                                    # f32, only the MXU dots drop precision


def _clamp_bounds(st: _Static) -> Tuple[float, float]:
    lo = 0.0 if st.zero_clamp else NEG_INF_MIN
    hi = 0.8 if st.stabalize else jnp.inf
    return lo, hi


def _group_slices(st: _Static):
    out = []
    start = 0
    for g in st.group_sizes:
        out.append((start, start + g))
        start += g
    return out


# ----------------------------------------------------------------------
# forward kernel


def _code_tile(ref, code_bf16):
    """Code tile in the dot dtype: the kernel-side bf16 cast keeps primals,
    residuals, and gradients f32 — only the MXU contraction (whose f32 form
    runs ~4x slower on v5e) sees the reduced precision."""
    t = ref[0]
    return t.astype(jnp.bfloat16) if code_bf16 else t


def _fwd_kernel(f1_ref, f2_ref, c1_ref, c2_ref, acc_ref, *, lo, hi,
                code_bf16):
    """acc rows: 0=s1, 1=s2, 2=s3, 3=cd_sum (over the col dimension)."""
    q = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((q == 0) & (k == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    fd = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cd = jax.lax.dot_general(
        _code_tile(c1_ref, code_bf16), _code_tile(c2_ref, code_bf16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cdc = jnp.clip(cd, lo, hi)
    sl = pl.ds(q * TQ, TQ)
    acc_ref[0, 0, sl] += jnp.sum(cdc * fd, axis=1)
    acc_ref[0, 1, sl] += jnp.sum(cdc, axis=1)
    acc_ref[0, 2, sl] += jnp.sum(fd, axis=1)
    acc_ref[0, 3, sl] += jnp.sum(cd, axis=1)


def _run_fwd(f1, f2, c1, c2, st: _Static):
    lo, hi = _clamp_bounds(st)

    def run(f1, f2, c1, c2):
        # shapes derived from the args: per-shard under shard_map on a mesh
        b, n_pad, cf = f1.shape
        cc = c1.shape[-1]
        nq, nk = n_pad // TQ, n_pad // TK
        return pl.pallas_call(
            functools.partial(_fwd_kernel, lo=lo, hi=hi,
                              code_bf16=st.code_bf16),
            grid=(b, nq, nk),
            in_specs=[
                pl.BlockSpec((1, TQ, cf), lambda b, q, k: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, cf), lambda b, q, k: (b, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TQ, cc), lambda b, q, k: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, cc), lambda b, q, k: (b, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, n_pad), lambda b, q, k: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            interpret=st.interpret,
        )(f1, f2, c1, c2)

    from stego_tpu.parallel.mesh import shard_kernel

    acc = shard_kernel(run, st.mesh, 4)(f1, f2, c1, c2)
    return acc[:, 0], acc[:, 1], acc[:, 2], acc[:, 3]


def _finalize(s1, s2, s3, cds, st: _Static):
    """Per-group closed-form loss from the streamed row sums.

    Returns (losses (G,), cd_means (G,), rowmean (B,1,N_pad), gm_b (B,))."""
    n = st.n_real
    losses, cd_means, gms = [], [], []
    for gi, (a, z) in enumerate(_group_slices(st)):
        gsz = z - a
        m = gsz * n * n
        s1r, s2r, s3r = s1[a:z, :n], s2[a:z, :n], s3[a:z, :n]
        big_s1, big_s2 = jnp.sum(s1r), jnp.sum(s2r)
        gm = jnp.sum(s3r) / m
        gms.append(gm)
        shift = st.shifts[gi]
        if st.pointwise:
            rowterm = jnp.sum(s3r * s2r) / n
            loss_sum = -(big_s1 - rowterm + (gm - shift) * big_s2)
        else:
            loss_sum = -(big_s1 - shift * big_s2)
        losses.append(loss_sum / m)
        cd_means.append(jnp.sum(cds[a:z, :n]) / m)
    rowmean = (s3 / n)[:, None, :]
    gm_b = jnp.concatenate([
        jnp.broadcast_to(gm, (z - a,))
        for gm, (a, z) in zip(gms, _group_slices(st))
    ])
    return jnp.stack(losses), jnp.stack(cd_means), rowmean, gm_b


# ----------------------------------------------------------------------
# backward kernels (per-batch-row scalars arrive via SMEM)


def _coeff_tile(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref, q,
                lo, hi, pointwise, code_bf16):
    """Recompute the (TQ, TK) dL/dcd tile (fd/cd are never stored).

    sc row layout: 0=g_loss, 1=g_cdm, 2=gm, 3=shift, 4=inv_m."""
    g_loss = sc_ref[0, 0, 0]
    g_cdm = sc_ref[0, 0, 1]
    gm = sc_ref[0, 0, 2]
    shift = sc_ref[0, 0, 3]
    inv_m = sc_ref[0, 0, 4]

    fd = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cd = jax.lax.dot_general(
        _code_tile(c1_ref, code_bf16), _code_tile(c2_ref, code_bf16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mask = ((cd >= lo) & (cd <= hi)).astype(jnp.float32)
    if pointwise:
        rm = rm_ref[0, 0, pl.ds(q * TQ, TQ)]
        fdp = fd - rm[:, None] + gm
    else:
        fdp = fd
    return (-(fdp - shift) * mask * g_loss + g_cdm) * inv_m


def _bwd_kernel(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref,
                dc1_ref, dc2_ref, dc2_scr, *, lo, hi, pointwise, nq, nk,
                code_bf16):
    """ONE pass computes both code gradients: the dL/dcd tile is recomputed
    once (round 1 ran two kernels, each recomputing the fd/cd tiles — a third
    of the backward matmul work was redundant). dc1 accumulates in its output
    block across the k axis; dc2 accumulates in a full-length VMEM scratch
    (its rows are touched non-consecutively across q) and flushes on the last
    tile of each batch row."""
    q = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        dc1_ref[...] = jnp.zeros_like(dc1_ref)

    @pl.when((q == 0) & (k == 0))
    def _():
        dc2_scr[...] = jnp.zeros_like(dc2_scr)

    coeff = _coeff_tile(f1_ref, f2_ref, c1_ref, c2_ref, rm_ref, sc_ref, q,
                        lo, hi, pointwise, code_bf16)
    # in bf16 mode the grad dots also run bf16 (coeff cast too; f32 accum) —
    # these are the remaining f32 contractions of the backward pass
    coeff_d = coeff.astype(jnp.bfloat16) if code_bf16 else coeff
    dc1_ref[0] += jnp.dot(coeff_d, _code_tile(c2_ref, code_bf16),
                          preferred_element_type=jnp.float32)
    # dc2_j += Σ_i coeff_ij * c1_i  — contract over the row dimension
    dc2_scr[pl.ds(k * TK, TK)] += jax.lax.dot_general(
        coeff_d, _code_tile(c1_ref, code_bf16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when((q == nq - 1) & (k == nk - 1))
    def _():
        dc2_ref[0] = dc2_scr[...]


def _run_bwd(f1, f2, c1, c2, rowmean, scalars, st: _Static):
    lo, hi = _clamp_bounds(st)

    def run(f1, f2, c1, c2, rowmean, scalars):
        b, n_pad, cf = f1.shape
        cc = c1.shape[-1]
        nq, nk = n_pad // TQ, n_pad // TK
        row = lambda b, q, k: (b, q, 0)
        col = lambda b, q, k: (b, k, 0)
        whole = lambda b, q, k: (b, 0, 0)
        in_specs = [
            pl.BlockSpec((1, TQ, cf), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cf), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, cc), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, cc), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), whole, memory_space=pltpu.SMEM),
        ]
        out = pl.pallas_call(
            functools.partial(_bwd_kernel, lo=lo, hi=hi,
                              pointwise=st.pointwise, nq=nq, nk=nk,
                              code_bf16=st.code_bf16),
            grid=(b, nq, nk),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, TQ, cc), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, cc), whole, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n_pad, cc), jnp.float32),
                jax.ShapeDtypeStruct((b, n_pad, cc), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((n_pad, cc), jnp.float32)],
            interpret=st.interpret,
        )(f1, f2, c1, c2, rowmean, scalars)
        return out[0], out[1]  # tuple, matching shard_map's out_specs pytree

    from stego_tpu.parallel.mesh import shard_kernel

    dc1, dc2 = shard_kernel(run, st.mesh, 6, n_out=2)(
        f1, f2, c1, c2, rowmean, scalars)
    return dc1, dc2


# ----------------------------------------------------------------------
# custom-vjp core on padded, normalized, group-stacked inputs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_core(f1, f2, c1, c2, st: _Static):
    s1, s2, s3, cds = _run_fwd(f1, f2, c1, c2, st)
    losses, cd_means, _, _ = _finalize(s1, s2, s3, cds, st)
    return losses, cd_means


def _fused_core_fwd(f1, f2, c1, c2, st: _Static):
    s1, s2, s3, cds = _run_fwd(f1, f2, c1, c2, st)
    losses, cd_means, rowmean, gm_b = _finalize(s1, s2, s3, cds, st)
    return (losses, cd_means), (f1, f2, c1, c2, rowmean, gm_b)


def _fused_core_bwd(st: _Static, residuals, cots):
    f1, f2, c1, c2, rowmean, gm_b = residuals
    g_losses, g_cdms = cots  # (G,), (G,) cotangents

    rows = []
    for gi, (a, z) in enumerate(_group_slices(st)):
        gsz = z - a
        inv_m = 1.0 / (gsz * st.n_real * st.n_real)
        rows.append(jnp.broadcast_to(
            jnp.stack([
                g_losses[gi], g_cdms[gi], jnp.float32(0.0),
                jnp.float32(st.shifts[gi]), jnp.float32(inv_m),
                jnp.float32(0), jnp.float32(0), jnp.float32(0),
            ]), (gsz, 8)))
    scalars = jnp.concatenate(rows, axis=0).astype(jnp.float32)
    scalars = scalars.at[:, 2].set(gm_b)
    scalars = scalars[:, None, :]  # (B, 1, 8): SMEM blocks need (1, 1, 8)
    dc1, dc2 = _run_bwd(f1, f2, c1, c2, rowmean, scalars, st)
    return jnp.zeros_like(f1), jnp.zeros_like(f2), dc1, dc2


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ----------------------------------------------------------------------
# public API


def _prep(t: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    b, n = t.shape[0], t.shape[1] * t.shape[2]
    t = t.reshape(b, n, t.shape[-1]).astype(jnp.float32)
    t = l2_normalize(t, axis=-1).astype(dtype)
    t = _pad_axis(t, TQ, axis=1)
    return _pad_axis(t, 128, axis=2)


def fused_correlation_loss_multi(
    pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    shifts: Sequence[float],
    pointwise: bool = True,
    zero_clamp: bool = True,
    stabalize: bool = False,
    interpret: bool | None = None,
    feat_dtype=jnp.float32,
    mesh=None,
    pre_prepped: bool = False,
    n_real: int | None = None,
    code_bf16: bool = False,
    split_groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All pair types in ONE kernel launch.

    Args:
      pairs: sequence of (f1, f2, c1, c2) NHWC tuples, one per pair type; all
        spatial sizes must match (batch sizes may differ). With
        ``pre_prepped=True`` the entries are instead already-normalized,
        padded (B, N_pad, C_pad) arrays (see :func:`_prep`) and ``n_real``
        must give the unpadded row count — used by the full-field caller to
        normalize each distinct tensor ONCE and tile/gather prepped rows,
        instead of re-normalizing (2+neg) stacked copies.
      shifts: per-pair-type loss shift.
      feat_dtype: storage/matmul dtype for the FEATURE side (fd is
        stop-gradient; bfloat16 doubles the fd dot throughput and halves the
        stacked-pair prep traffic — appropriate when the features already
        come from a bf16 trunk). The code side (gradient-carrying cd dots)
        stays float32 unless ``code_bf16``.
      code_bf16: cast the code tiles (and the backward's dL/dcd coefficient)
        to bfloat16 INSIDE the kernels, with f32 accumulation. Primals,
        residuals, and returned gradients stay f32 — only the MXU
        contractions lose precision (cd abs error ~1e-2; see
        test_pallas.py tolerance rows). Opt-in via cfg.pallas_loss_bf16.
      mesh: a >1-device Mesh runs the fwd/bwd kernels per batch shard
        (shard_map); the stacked-group batch dim must divide the mesh size.
        The finalize reductions and negative gathers stay in plain XLA and
        are partitioned by GSPMD — results are identical to single-device.
      split_groups: split every pair type into this many equal-sized
        consecutive batch blocks, each its OWN group (own pointwise fd mean),
        then average the block losses per type. ``negatives_scope=local`` on
        a D-device mesh sets this to D: each block is one shard, reproducing
        the reference's per-process DDP semantics (every DDP process
        computes helper()'s fd.mean() over its local batch,
        src/modules.py:330-333 under train_segmentation.py:476) — and
        matching the per-shard fused-sampling kernel exactly. Zero data
        movement: only the finalize's group slicing changes.
    Returns:
      (losses (G,), cd_means (G,)) — per pair type, each equal to the einsum
      oracle's ``loss.mean()`` / ``cd.mean()`` for that pair.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_types = len(pairs)
    if split_groups > 1:
        for p in pairs:
            if p[0].shape[0] % split_groups:
                raise ValueError(
                    f"pair batch {p[0].shape[0]} not divisible by "
                    f"split_groups {split_groups}")
        group_sizes = tuple(p[0].shape[0] // split_groups
                            for p in pairs for _ in range(split_groups))
        shifts = [s for s in shifts for _ in range(split_groups)]
    else:
        group_sizes = tuple(p[0].shape[0] for p in pairs)

    if pre_prepped:
        assert n_real is not None, "pre_prepped needs n_real"
        n = n_real
        prep_f = prep_c = lambda t: t
    else:
        n = pairs[0][0].shape[1] * pairs[0][0].shape[2]
        prep_f = lambda t: _prep(t, feat_dtype)
        prep_c = _prep

    f1 = jax.lax.stop_gradient(
        jnp.concatenate([prep_f(p[0]) for p in pairs], axis=0))
    f2 = jax.lax.stop_gradient(
        jnp.concatenate([prep_f(p[1]) for p in pairs], axis=0))
    c1 = jnp.concatenate([prep_c(p[2]) for p in pairs], axis=0)
    c2 = jnp.concatenate([prep_c(p[3]) for p in pairs], axis=0)

    if mesh is not None and mesh.devices.size <= 1:
        mesh = None
    st = _Static(
        shifts=tuple(float(s) for s in shifts),
        group_sizes=group_sizes,
        pointwise=bool(pointwise), zero_clamp=bool(zero_clamp),
        stabalize=bool(stabalize), n_real=n, interpret=bool(interpret),
        mesh=mesh, code_bf16=bool(code_bf16),
    )
    losses, cd_means = _fused_core(f1, f2, c1, c2, st)
    if split_groups > 1:
        # per pair type: mean of its equal-sized block losses
        losses = jnp.mean(losses.reshape(n_types, split_groups), axis=1)
        cd_means = jnp.mean(cd_means.reshape(n_types, split_groups), axis=1)
    return losses, cd_means


def fused_correlation_loss(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    shift: float,
    pointwise: bool = True,
    zero_clamp: bool = True,
    stabalize: bool = False,
    interpret: bool | None = None,
    code_bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pair fused loss (one group). Returns (loss_mean, cd_mean)."""
    losses, cd_means = fused_correlation_loss_multi(
        [(f1, f2, c1, c2)], [shift], pointwise=pointwise,
        zero_clamp=zero_clamp, stabalize=stabalize, interpret=interpret,
        code_bf16=code_bf16,
    )
    return losses[0], cd_means[0]


def contrastive_correlation_loss_fused(
    cfg,
    key: jax.Array,
    orig_feats: jnp.ndarray,
    orig_feats_pos: jnp.ndarray,
    orig_code: jnp.ndarray,
    orig_code_pos: jnp.ndarray,
    orig_salience: jnp.ndarray | None = None,
    orig_salience_pos: jnp.ndarray | None = None,
    full_field: bool = False,
    interpret: bool | None = None,
    return_cd_tensors: bool = False,
    feat_dtype=jnp.float32,
    mesh=None,
    code_bf16: bool = False,
    sampling_impl: str = "auto",
):
    """Three-pair contrastive loss through the fused kernel.

    Drop-in for :func:`stego_tpu.ops.correlation.contrastive_correlation_loss`
    with scalar cd outputs by default. ``return_cd_tensors=True`` (sampled
    mode only) additionally computes the three cd tensors with cheap einsums
    on the already-sampled values — full histogram observability at ~0.1 ms,
    while the loss/grads still run through the fused kernel.
    ``full_field=True`` skips coordinate sampling and runs the loss over the
    complete (HW x HW) correspondence field — the reference's 11x11 subsampled
    loss becomes the exact dense objective. All pair types (self, knn-pos,
    stacked negatives) run in ONE launch. Salience-biased coordinate draws
    (reference modules.py:355-364) behave exactly like the einsum oracle;
    salience is incompatible with ``full_field`` (there is no coordinate draw
    to bias) and raises.
    """
    from stego_tpu.ops.correlation import _draw_coords
    from stego_tpu.ops.math import block_local_super_perm
    from stego_tpu.ops.sampling import sample_from_coords

    b = orig_feats.shape[0]
    k_c1, k_c2, k_neg = jax.random.split(key, 3)

    shifts = [cfg.pos_intra_shift, cfg.pos_inter_shift]
    has_neg = cfg.neg_samples > 0
    if has_neg:
        # negatives_scope=local draws one derangement per mesh shard
        # (neg_blocks == mesh size; reference per-process DDP semantics)
        perms = [block_local_super_perm(b, nk, getattr(cfg, "neg_blocks", 1))
                 for nk in jax.random.split(k_neg, cfg.neg_samples)]
        # ONE GROUP PER NEGATIVE SAMPLE: the reference's pointwise recenter
        # uses fd.mean() of each helper() CALL (modules.py:331-333), i.e. a
        # separate group mean per k — pooling all negatives into one group
        # (round 1-3) deviated by ~1e-4 relative in loss and ~2% elementwise
        # in the code grads under pointwise=true
        shifts = shifts + [cfg.neg_inter_shift] * cfg.neg_samples

    if full_field:
        if cfg.use_salience and orig_salience is not None:
            raise ValueError(
                "use_salience is incompatible with full_field_loss: the dense "
                "loss has no coordinate draw to bias (reference "
                "modules.py:355-364 applies salience to coordinate sampling)."
            )
        # Normalize/pad each DISTINCT tensor once and build the stacked
        # groups by tiling/gathering prepped (B, N_pad, C_pad) rows — _prep
        # is per-batch-row, so this is exactly equivalent to prepping the
        # stacked copies but does 1x instead of (2+neg)x the normalize
        # traffic on the dense (B, HW, C) maps (round-2 TODO #7: stacked-
        # pair prep was a measured chunk of the full-field step).
        n_hw = orig_feats.shape[1] * orig_feats.shape[2]
        fp = jax.lax.stop_gradient(_prep(orig_feats, feat_dtype))
        fpp = jax.lax.stop_gradient(_prep(orig_feats_pos, feat_dtype))
        cp = _prep(orig_code)
        cpp = _prep(orig_code_pos)
        pairs = [(fp, fp, cp, cp), (fp, fpp, cp, cpp)]
        for p in perms:
            pairs.append((fp, fp[p], cp, cp[p]))
        losses, cd_means = fused_correlation_loss_multi(
            pairs, shifts, pointwise=cfg.pointwise, zero_clamp=cfg.zero_clamp,
            stabalize=cfg.stabalize, interpret=interpret,
            feat_dtype=feat_dtype, mesh=mesh, pre_prepped=True, n_real=n_hw,
            code_bf16=code_bf16, split_groups=getattr(cfg, "neg_blocks", 1),
        )
        code = code_pos = None
    elif sampling_impl == "fused":
        # round-4 lever (VERDICT r3 #2): coordinate sampling + post-sample
        # normalize + correlation in ONE fwd + ONE bwd Pallas launch
        # (ops/pallas_corr_fused_sampling.py); negatives are read by index
        # inside the kernel, so no orig[perm] gather copies or scatter-add
        # backward exist. Dispatched by the feature-cache step.
        from stego_tpu.ops.pallas_corr_fused_sampling import sampled_corr_fused

        if mesh is not None and mesh.devices.size > 1:
            # the fused kernel reads negatives by source index inside the
            # kernel AND computes the pointwise fd means per shard, so on a
            # mesh the config MUST declare shard-local semantics
            # (negatives_scope=local -> neg_blocks == mesh size) — a global
            # config would silently get different (per-shard) numerics. Fail
            # loudly rather than compute garbage (round-4 advisor finding).
            if getattr(cfg, "neg_blocks", 1) != mesh.devices.size:
                raise ValueError(
                    "sampling_impl='fused' on a >1-device mesh needs "
                    "shard-local negatives: set negatives_scope='local' "
                    f"(cfg.neg_blocks={getattr(cfg, 'neg_blocks', 1)} != mesh "
                    f"size {mesh.devices.size})")
        elif getattr(cfg, "neg_blocks", 1) > 1:
            raise ValueError(
                "neg_blocks>1 (negatives_scope=local) with sampling_impl="
                "'fused' requires the matching multi-device mesh — the "
                "single-device fused kernel computes one pointwise mean per "
                "pair type, not per block (use the streamed path to emulate "
                "shard semantics on one device)")
        if code_bf16:
            raise ValueError(
                "pallas_loss_bf16 is not implemented for the fused-sampling "
                "kernel (its code side is f32 end-to-end; the flag is a "
                "measured non-win — CLAUDE.md). Use the streamed path "
                "(fused_sampling='off') to honor it.")
        s = cfg.feature_samples
        coords1 = _draw_coords(k_c1, b, s, orig_salience, cfg)
        coords2 = _draw_coords(k_c2, b, s, orig_salience_pos, cfg)
        losses, cd_means = sampled_corr_fused(
            orig_feats, orig_feats_pos, orig_code, orig_code_pos,
            coords1, coords2, perms if has_neg else [], shifts,
            pointwise=cfg.pointwise, zero_clamp=cfg.zero_clamp,
            stabalize=cfg.stabalize, feat_dtype=feat_dtype,
            interpret=interpret, mesh=mesh,
        )
        code = code_pos = None
        if return_cd_tensors:
            # hist-step observability only: materialize the sampled codes via
            # the XLA sampler (state grads still come from the fused kernel,
            # so hist and no-hist steps stay numerically identical)
            from stego_tpu.ops.sampling import sample_from_coords

            code = sample_from_coords(orig_code, coords1)
            code_pos = sample_from_coords(orig_code_pos, coords2)
            if has_neg:
                code_neg = jnp.concatenate(
                    [sample_from_coords(orig_code[p], coords2)
                     for p in perms], axis=0)
    else:
        s = cfg.feature_samples
        coords1 = _draw_coords(k_c1, b, s, orig_salience, cfg)
        coords2 = _draw_coords(k_c2, b, s, orig_salience_pos, cfg)

        from stego_tpu.ops.sampling import (
            apply_sample_weights,
            bilinear_sample_weights,
            resolve_sampling_impl,
        )

        hw = orig_feats.shape[1:3]
        impl = resolve_sampling_impl(hw, (s, s), sampling_impl)
        if impl == "matmul":
            # one weight matrix per coordinate set, shared across every
            # tensor sampled at it (the per-call form rebuilt it 12x); the
            # negatives batch into ONE (neg·B)-batched contraction
            g1 = jnp.transpose(coords1, (0, 2, 1, 3))
            g2 = jnp.transpose(coords2, (0, 2, 1, 3))
            w1 = bilinear_sample_weights(hw, g1)
            w2 = bilinear_sample_weights(hw, g2)
            ohw = (s, s)
            feats = apply_sample_weights(w1, orig_feats, ohw)
            code = apply_sample_weights(w1, orig_code, ohw)
            feats_pos = apply_sample_weights(w2, orig_feats_pos, ohw)
            code_pos = apply_sample_weights(w2, orig_code_pos, ohw)
            if has_neg:
                p_all = jnp.concatenate(perms, axis=0)  # (neg·B,)
                w2_t = jnp.tile(w2, (cfg.neg_samples, 1, 1))
                feats_neg = apply_sample_weights(w2_t, orig_feats[p_all], ohw)
                code_neg = apply_sample_weights(w2_t, orig_code[p_all], ohw)
        else:
            def sample(t, c):
                return sample_from_coords(t, c, impl=impl)

            feats = sample(orig_feats, coords1)
            code = sample(orig_code, coords1)
            feats_pos = sample(orig_feats_pos, coords2)
            code_pos = sample(orig_code_pos, coords2)
            if has_neg:
                feats_neg = jnp.concatenate(
                    [sample(orig_feats[p], coords2) for p in perms], axis=0)
                code_neg = jnp.concatenate(
                    [sample(orig_code[p], coords2) for p in perms], axis=0)

        pairs = [
            (feats, feats, code, code),
            (feats, feats_pos, code, code_pos),
        ]
        for k in range(cfg.neg_samples):
            pairs.append((feats, feats_neg[k * b:(k + 1) * b],
                          code, code_neg[k * b:(k + 1) * b]))

        losses, cd_means = fused_correlation_loss_multi(
            pairs, shifts, pointwise=cfg.pointwise, zero_clamp=cfg.zero_clamp,
            stabalize=cfg.stabalize, interpret=interpret,
            feat_dtype=feat_dtype, mesh=mesh, code_bf16=code_bf16,
            split_groups=getattr(cfg, "neg_blocks", 1),
        )
    zero = jnp.zeros((), jnp.float32)
    has_neg = cfg.neg_samples > 0
    out = {
        "pos_intra_loss": losses[0],
        "pos_intra_cd": cd_means[0],
        "pos_inter_loss": losses[1],
        "pos_inter_cd": cd_means[1],
        "neg_inter_loss": jnp.mean(losses[2:]) if has_neg else zero,
        "neg_inter_cd": jnp.mean(cd_means[2:]) if has_neg else zero,
    }
    if return_cd_tensors and not full_field:
        from stego_tpu.ops.math import l2_normalize, tensor_correlation

        def cd_of(c1, c2):
            return jax.lax.stop_gradient(
                tensor_correlation(l2_normalize(c1), l2_normalize(c2)))

        out["pos_intra_cd"] = cd_of(code, code)
        out["pos_inter_cd"] = cd_of(code, code_pos)
        if has_neg:
            reps = (cfg.neg_samples,) + (1,) * (code.ndim - 1)
            out["neg_inter_cd"] = cd_of(jnp.tile(code, reps), code_neg)
    return out
