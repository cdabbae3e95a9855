"""On-TPU parity: flash_gat_dense (Mosaic) vs gat_aggregate_dense (XLA)."""
import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import gat_aggregate_dense
from cal_tpu.ops.pallas_gat import flash_gat_dense

rng = np.random.default_rng(0)
B, N, heads, d = 8, 232, 4, 32
xh = jnp.asarray(rng.standard_normal((B, N, heads, d)), jnp.float32)
adj_np = (rng.random((B, N, N)) < 0.02).astype(np.float32)
adj = jnp.asarray(adj_np + adj_np.transpose(0, 2, 1))
att_dst = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
att_src = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1

# --- forward, no dropout ---
ref = jax.jit(lambda *a: gat_aggregate_dense(*a))(xh, adj, att_dst, att_src)
got = jax.jit(lambda *a: flash_gat_dense(*a))(xh, adj, att_dst, att_src)
err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print("fwd nodrop rel-max err:", err)

# --- grads, no dropout ---
def loss_ref(xh, att_dst, att_src):
    return jnp.sum(gat_aggregate_dense(xh, adj, att_dst, att_src) ** 2)

def loss_flash(xh, att_dst, att_src):
    return jnp.sum(flash_gat_dense(xh, adj, att_dst, att_src) ** 2)

gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(xh, att_dst, att_src)
gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(xh, att_dst, att_src)
for name, a, b in zip(("dxh", "datt_dst", "datt_src"), gr, gf):
    e = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"grad nodrop {name} rel-max err: {e}")

# --- forward with dropout: check mean preservation + keep-rate ---
k = jax.random.PRNGKey(3)
gotd = jax.jit(lambda *a: flash_gat_dense(*a, 0.2, k))(xh, adj, att_dst, att_src)
print("fwd dropout mean ratio (want ~1):",
      float(jnp.sum(gotd) / (jnp.sum(ref) + 1e-9)))
print("fwd dropout frac outputs changed:",
      float(jnp.mean(jnp.abs(gotd - got) > 1e-7)))

# --- dropout grads: determinism of replay (run twice, same seed) ---
def loss_flash_d(xh):
    return jnp.sum(flash_gat_dense(xh, adj, att_dst, att_src, 0.2, k) ** 2)

g1 = jax.jit(jax.grad(loss_flash_d))(xh)
g2 = jax.jit(jax.grad(loss_flash_d))(xh)
print("dropout grad replay max abs diff:", float(jnp.max(jnp.abs(g1 - g2))))
print("dropout grad finite:", bool(jnp.isfinite(g1).all()))
