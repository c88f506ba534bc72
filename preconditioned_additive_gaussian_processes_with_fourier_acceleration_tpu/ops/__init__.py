from . import distances, kernels, matops, knn, fps, rankest, fastsum
