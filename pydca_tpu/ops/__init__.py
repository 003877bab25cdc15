from .lbfgs import lbfgs_minimize, LBFGSResult  # noqa: F401
