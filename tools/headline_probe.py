import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs", 0.0
)
import jax.numpy as jnp
import numpy as np
from recursive_stwo_tpu.models.flagship import prepared_arrays, tiled_batch
from recursive_stwo_tpu.verifier import verify
spec, pa = prepared_arrays('small_proof')
paj = jax.tree.map(jnp.asarray, tiled_batch(pa, 1024))
fn = jax.jit(lambda a: verify.verify_batch(spec, a, verify.INPUTS_ONE)["ok"])
ok = np.asarray(fn(paj)); assert ok.all()
for trial in range(3):
    t0=time.perf_counter()
    for _ in range(10): out=fn(paj)
    out.block_until_ready()
    dt=(time.perf_counter()-t0)/10
    print(f"rblk={os.environ.get('RSTPU_PALLAS_RBLK','32')} trial{trial}: {1024/dt:.1f} proofs/s ({dt*1e3:.2f} ms)")
