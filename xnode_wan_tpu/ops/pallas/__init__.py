from xnode_wan_tpu.ops.pallas.xnode_eval import fused_evaluate  # noqa: F401
