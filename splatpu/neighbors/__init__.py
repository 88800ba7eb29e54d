from splatpu.neighbors.knn import knn
