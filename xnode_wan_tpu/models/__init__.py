from xnode_wan_tpu.models import discriminator, layers, wan, xnode  # noqa: F401
