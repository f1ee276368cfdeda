import sys, os, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocs2_tpu_jax_cache")
import bench
ps, mfu = bench.bench_batched_quadrotor()
print(json.dumps({"mode": os.environ.get("OCS2_TPU_PALLAS", "auto"), "quadrotor": round(float(ps),1)}))
