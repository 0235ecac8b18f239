from . import camera, color, intersect, mathops, resample, sampling  # noqa: F401
