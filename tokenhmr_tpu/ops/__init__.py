from . import rotations, projection, procrustes, crop, merge
