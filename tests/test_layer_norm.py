"""Fused Pallas layernorm vs the XLA form (interpret mode on CPU).

The kernel (ops/layer_norm.py) replaces models/vit.py:_layer_norm on the
unrolled bf16 trunk path; these tests pin (a) forward parity, (b) the
custom-VJP backward, (c) mesh sharding, (d) the in-trunk dispatch.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from stego_tpu.models.vit import ViTConfig, _layer_norm, init_vit_params, \
    vit_get_intermediate_feat
from stego_tpu.ops.layer_norm import fused_layer_norm
from stego_tpu.parallel.mesh import batch_sharding, make_mesh

EPS = 1e-6


def _inputs(key, shape=(3, 37, 48), dtype=jnp.bfloat16):
    x = jr.normal(key, shape, jnp.float32) * 2.0 + 0.3
    scale = jr.normal(jr.fold_in(key, 1), (shape[-1],)) * 0.2 + 1.0
    bias = jr.normal(jr.fold_in(key, 2), (shape[-1],)) * 0.1
    return x.astype(dtype), scale, bias


def test_fused_ln_matches_xla_bf16():
    x, scale, bias = _inputs(jr.PRNGKey(0))
    ref = _layer_norm({"scale": scale, "bias": bias}, x, EPS)
    got = fused_layer_norm(x, scale, bias, EPS, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_fused_ln_matches_xla_f32():
    x, scale, bias = _inputs(jr.PRNGKey(3), dtype=jnp.float32)
    ref = _layer_norm({"scale": scale, "bias": bias}, x, EPS)
    got = fused_layer_norm(x, scale, bias, EPS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_ln_grad_matches_xla():
    # custom-VJP backward (plain XLA path; the trunk is frozen but stray
    # grads through the backbone must still be exact)
    x, scale, bias = _inputs(jr.PRNGKey(4), shape=(2, 9, 32),
                             dtype=jnp.float32)

    def loss_ref(x, s, b):
        y = _layer_norm({"scale": s, "bias": b}, x, EPS)
        return jnp.sum(jnp.sin(y))

    def loss_fused(x, s, b):
        y = fused_layer_norm(x, s, b, EPS, interpret=True)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_add_layer_norm_matches_sequential():
    # un-dispatched kernel (measured non-win on v5e — see its docstring);
    # parity is pinned so it stays correct if a future chip flips the call
    from stego_tpu.ops.layer_norm import add_layer_norm

    x, scale, bias = _inputs(jr.PRNGKey(7), shape=(2, 21, 40))
    y = jr.normal(jr.PRNGKey(8), x.shape, jnp.float32).astype(x.dtype)
    r_ref = x + y
    o_ref = _layer_norm({"scale": scale, "bias": bias}, r_ref, EPS)
    r, o = add_layer_norm(x, y, scale, bias, EPS, interpret=True)
    np.testing.assert_array_equal(np.asarray(r, np.float32),
                                  np.asarray(r_ref, np.float32))
    np.testing.assert_array_equal(np.asarray(o, np.float32),
                                  np.asarray(o_ref, np.float32))

    def loss_seq(x, y, s, b):
        r = x + y
        return jnp.sum(jnp.cos(_layer_norm({"scale": s, "bias": b}, r, EPS))
                       + r * 0.25)

    def loss_fused(x, y, s, b):
        r, o = add_layer_norm(x, y, s, b, EPS, interpret=True)
        return jnp.sum(jnp.cos(o) + r * 0.25)

    xf, yf = x.astype(jnp.float32), y.astype(jnp.float32)
    g_ref = jax.grad(loss_seq, argnums=(0, 1, 2, 3))(xf, yf, scale, bias)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xf, yf, scale, bias)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_fused_ln_sharded_matches_single(cpu_devices):
    mesh = make_mesh()
    x, scale, bias = _inputs(jr.PRNGKey(5), shape=(8, 13, 64))
    ref = fused_layer_norm(x, scale, bias, EPS, interpret=True)
    xs = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(lambda x: fused_layer_norm(
        x, scale, bias, EPS, interpret=True, mesh=mesh))(xs)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_fused_ln_sharded_grad_matches_single(cpu_devices):
    # the custom VJP through the n_rep-replicated scale/bias under shard_map
    # must psum dg/db over the mesh — a missing reduction shows up here
    mesh = make_mesh()
    x, scale, bias = _inputs(jr.PRNGKey(6), shape=(8, 13, 64),
                             dtype=jnp.float32)

    def loss(x, s, b, m):
        y = fused_layer_norm(x, s, b, EPS, interpret=True, mesh=m)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias, None)
    xs = jax.device_put(x, batch_sharding(mesh))
    g_got = jax.jit(jax.grad(
        lambda x, s, b: loss(x, s, b, mesh), argnums=(0, 1, 2)))(
        xs, scale, bias)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_flash_trunk_uses_fused_ln_and_matches(monkeypatch):
    """use_flash bf16 trunk (the dispatch that routes to the kernel) equals
    the einsum/XLA trunk to bf16 tolerance."""
    import stego_tpu.models.vit as V

    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=3, num_heads=4,
                    img_size=16)
    params = init_vit_params(jr.PRNGKey(0), cfg)
    img = jr.normal(jr.PRNGKey(1), (2, 16, 16, 3))
    f_ref, _, _ = vit_get_intermediate_feat(
        params, img, cfg, dtype=jnp.bfloat16, use_flash=False)
    assert V.FUSED_LN
    f_fus, _, _ = vit_get_intermediate_feat(
        params, img, cfg, dtype=jnp.bfloat16, use_flash=True)
    np.testing.assert_allclose(np.asarray(f_fus[0]), np.asarray(f_ref[0]),
                               rtol=2e-2, atol=2e-2)
    # and with the kill switch the two flash trunks agree exactly
    monkeypatch.setattr(V, "FUSED_LN", False)
    f_off, _, _ = vit_get_intermediate_feat(
        params, img, cfg, dtype=jnp.bfloat16, use_flash=True)
    np.testing.assert_array_equal(np.asarray(f_fus[0]), np.asarray(f_off[0]))
