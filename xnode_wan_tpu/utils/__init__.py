from xnode_wan_tpu.utils import checkpoint, logging, metrics, viz  # noqa: F401
