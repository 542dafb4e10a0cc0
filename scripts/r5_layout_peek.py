"""Peek at device layouts of [N,6] producer outputs vs device_put arrays,
and time the per-frame device_put relayout pattern (r5 gather layout fix
verification).

Usage: scripts/tpu_run.sh /tmp/peek.txt 1800 400 2 -- python -u scripts/r5_layout_peek.py
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, ".")

N = 5_834_784
rng = np.random.default_rng(7)
src = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))


def fmt(x, name):
    for attr in ("format", "layout"):
        try:
            v = getattr(x, attr)
            print(f"{name}.{attr} = {v}", flush=True)
            return
        except Exception as e:
            print(f"{name}.{attr} failed: {type(e).__name__} {e}", flush=True)


@jax.jit
def producer6(src):
    t = jnp.concatenate(
        [src[:, 0:2], src[:, 3:4], src[:, 5:6], src[:, 7:8], src[:, 9:10]],
        axis=-1,
    )
    return jax.lax.optimization_barrier(t)


t6_param = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
t6_prod = jax.block_until_ready(producer6(src))
t6_relay = jax.device_put(t6_prod)
print("relay is prod:", t6_relay is t6_prod, flush=True)
fmt(t6_param, "t6_param(device_put)")
fmt(t6_prod, "t6_prod(jit output)")
fmt(t6_relay, "t6_relay(device_put of output)")

# per-frame device_put cost/behavior: does it copy every call?
t0 = time.perf_counter()
outs = [jax.device_put(t6_prod) for _ in range(20)]
jax.block_until_ready(outs)
np.asarray(outs[-1][:1])
print(f"20x device_put dispatch+fetch: {time.perf_counter()-t0:.3f}s",
      flush=True)
print("all identical objects:", all(o is t6_prod for o in outs), flush=True)
