from .gn import solve_normal, gn_update, block_hessian  # noqa: F401
