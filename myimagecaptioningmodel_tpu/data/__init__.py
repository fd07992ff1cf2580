"""Data plane: offline dataset build (HDF5 shards + caption DBs) and online readers."""
