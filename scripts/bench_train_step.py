"""Training-step microbenchmark on the attached TPU (see PERFORMANCE.md)."""

import time, numpy as np, jax, jax.numpy as jnp
from matcha_tpu.models import MatchaTTS
from matcha_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

B, Tx, Ty = 32, 384, 832
model = MatchaTTS()
rng = np.random.default_rng(0)
batch = {
  "x": rng.integers(1,178,size=(B,Tx)).astype(np.int32),
  "x_lengths": rng.integers(Tx//2, Tx+1, size=B).astype(np.int32),
  "y": rng.normal(size=(B,Ty,80)).astype(np.float32),
  "y_lengths": rng.integers(Ty//2, Ty+1, size=B).astype(np.int32),
  "spks": None,
}
params = model.init({"params": jax.random.PRNGKey(0)},
  jnp.asarray(batch["x"][:2]), jnp.asarray(batch["x_lengths"][:2]),
  jnp.asarray(batch["y"][:2]), jnp.asarray(batch["y_lengths"][:2]), jax.random.PRNGKey(1))
print("init done", flush=True)
tx = make_optimizer()
mesh = make_mesh(n_model=1)
params = jax.device_put(params, replicated(mesh))
state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
step = make_train_step(model, tx)
db = shard_batch(batch, mesh)
t0=time.time(); state, m = step(state, db, jax.random.PRNGKey(2)); jax.block_until_ready(m)
print("compile+first step:", round(time.time()-t0,1), "loss:", float(m["loss"]), flush=True)
t0=time.time()
for _ in range(10):
    state, m = step(state, db, jax.random.PRNGKey(2))
jax.block_until_ready(m)
dt = (time.time()-t0)/10
print(f"steady train step: {dt*1000:.1f} ms  ({B/dt:.0f} utt/s, {B*Ty*256/22050/dt:.1f} audio-sec/s)", flush=True)
