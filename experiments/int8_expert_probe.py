"""Why is the dense int8 Mixtral expert einsum ~10x slower than bf16?

mix_naive_w8 measured 85.5 ms/step vs bf16's 8.95 at 8L/2E full width
(B=1 decode). Both go through mixtral._expert_matmul's Int8Weight
branch: einsum("bsd,edi->bsei", x, q.astype(bf16)). This probe times
the einsum in isolation across (B, dtype, formulation) to find the bad
lowering.
"""
import os, time, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

E, D, I = 2, 4096, 14336
N_IT = 256

def log(m): print(m, flush=True)

def chain(f, x, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = f(c, w)                      # (B,S,E,I) f32
            nxt = jnp.tanh(y.mean(axis=(2, 3), keepdims=False))[:, :, None] * 0 + c
            # data dep: fold a scalar of y back into x
            return (c + y.mean() * 1e-9).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=N_IT)
        return c.sum()
    return run

def mintime(run, *args):
    float(run(*args)); ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)

floor_run = jax.jit(lambda x: x.sum())
_ = float(floor_run(jnp.ones(8)))
floor = min(mintime(floor_run, jnp.ones(8)) for _ in range(3))
log(f"floor {floor*1e3:.1f} ms")

key = jax.random.PRNGKey(0)
wq = jax.random.randint(key, (E, D, I), -127, 127, jnp.int8)
wb = (wq.astype(jnp.bfloat16) * 2e-4)
scale = jnp.full((E, I), 2e-4, jnp.float32)

for B in (1, 4):
    x = jnp.ones((B, 1, D), jnp.bfloat16)
    f_bf16 = lambda x, w: jnp.einsum("bsd,edi->bsei", x, w, preferred_element_type=jnp.float32)
    f_int8cast = lambda x, w: jnp.einsum("bsd,edi->bsei", x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * scale
    f_int8direct = lambda x, w: jnp.einsum("bsd,edi->bsei", x, w, preferred_element_type=jnp.float32) * scale
    f_int8_reshape = lambda x, w: (jnp.matmul(x[:, 0].astype(jnp.bfloat16), w.astype(jnp.bfloat16).reshape(E*D, I).reshape(E, D, I).transpose(1,0,2).reshape(D, E*I), preferred_element_type=jnp.float32).reshape(B, E, I)[:, None] * scale)
    for name, f, w in (("bf16", f_bf16, wb), ("int8cast", f_int8cast, wq),
                       ("int8direct", f_int8direct, wq),
                       ("int8_flatmm", f_int8_reshape, wq)):
        try:
            t = (mintime(chain(f, x, w), x, w) - floor) / N_IT
            log(f"B={B} {name}: {t*1e6:.0f} us/it")
        except Exception as e:
            log(f"B={B} {name}: ERROR {repr(e)[:120]}")
