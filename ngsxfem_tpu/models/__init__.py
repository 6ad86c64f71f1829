from .poisson import UnfittedPoisson, cut_poisson_elmats, ghost_penalty_elmats  # noqa: F401
