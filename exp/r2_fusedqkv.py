"""3 separate [4680,1536]x[1536,1536] matmuls vs one fused [1536,4608] —
and the layer's elementwise chain (LN+mod) fused in, to size the remaining
non-attention overhead levers."""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
M, D = 4680, 1536
N_ITER = 32
_null = None

def _sync(x): np.asarray(jax.device_get(x[(0,)*x.ndim]))

def null_overhead():
    global _null
    if _null is None:
        f = jax.jit(lambda x: x + 1.0); x = jnp.zeros((8,128)); _sync(f(x))
        ts = []
        for _ in range(5):
            t0=time.perf_counter(); _sync(f(x)); ts.append(time.perf_counter()-t0)
        _null = min(ts)
    return _null

def timeit(fn, *a):
    out = fn(*a); _sync(out)
    best = float("inf")
    for _ in range(3):
        t0=time.perf_counter(); out=fn(*a); _sync(out)
        best=min(best, time.perf_counter()-t0)
    return max(best-null_overhead(),1e-9)/N_ITER

def emit(**kw):
    line = json.dumps({"exp":"fusedqkv", **{k:(round(v,4) if isinstance(v,float) else v) for k,v in kw.items()}})
    print(line, flush=True)
    open("/root/repo/exp/r2_results.jsonl","a").write(line+"\n")

key = jax.random.key(0)
x = jax.random.normal(key,(M,D),jnp.bfloat16)
w3 = [jax.random.normal(jax.random.fold_in(key,i),(D,D),jnp.bfloat16)*0.05 for i in range(3)]
wf = jnp.concatenate(w3, axis=1)
gamma = jnp.ones((D,), jnp.float32); shift = jnp.zeros((D,), jnp.float32)

def ln_mod(c):
    mu = jnp.mean(c.astype(jnp.float32),-1,keepdims=True)
    var = jnp.var(c.astype(jnp.float32),-1,keepdims=True)
    h = (c.astype(jnp.float32)-mu)*jax.lax.rsqrt(var+1e-6)
    return (h*(1+gamma)+shift).astype(c.dtype)

@jax.jit
def sep(x):
    def body(c,_):
        h = ln_mod(c)
        q = h@w3[0]; k = h@w3[1]; v = h@w3[2]
        return (c + (q+k+v)*1e-24).astype(c.dtype), None
    c,_ = jax.lax.scan(body,x,None,length=N_ITER); return c

@jax.jit
def fused(x):
    def body(c,_):
        h = ln_mod(c)
        qkv = h@wf
        q,k,v = jnp.split(qkv,3,axis=1)
        return (c + (q+k+v)*1e-24).astype(c.dtype), None
    c,_ = jax.lax.scan(body,x,None,length=N_ITER); return c

emit(variant="sep_qkv_lnmod", ms=timeit(sep,x)*1e3)
emit(variant="fused_qkv_lnmod", ms=timeit(fused,x)*1e3)
