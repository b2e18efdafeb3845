from sglang_awq_tpu.parallel.mesh import make_mesh
from sglang_awq_tpu.parallel.sharding import param_pspecs, kv_pspec

__all__ = ["make_mesh", "param_pspecs", "kv_pspec"]
