import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

N, K, F = 3072, 100, 480
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, F))
src = jax.random.randint(key, (N, K), 0, N)
ct = jax.random.normal(key, (N, K, F))

def probe(name, fn, *args, iters=5):
    def loop(*a):
        def body(acc, _):
            return acc + fn(*[q + 1e-30*acc if q.dtype==jnp.float32 else q for q in a]), None
        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc
    f = jax.jit(loop)
    t0=time.time(); float(f(*args)); c=time.time()-t0
    t0=time.time(); float(f(*args))
    print(f"{name}: compile {c:.0f}s, {(time.time()-t0)/iters*1e3:.1f} ms/iter", flush=True)

# gather fwd
probe("gather fwd", lambda x, s: x[s].sum(), x, src)
# gather transpose (scatter-add) via vjp
def g(x, s, ct):
    _, vjp = jax.vjp(lambda xx: xx[s], x)
    return vjp(ct)[0].sum()
probe("gather bwd (scatter-add)", g, x, src, ct)
