from xnode_wan_tpu.ops import coefficients, integrate, sampling, weak_form  # noqa: F401
