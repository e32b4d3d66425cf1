# Submodules are imported directly (e.g. `from binocular3dgs_tpu.ops import knn`)
# rather than re-exported here, to avoid import cycles with the models package.
