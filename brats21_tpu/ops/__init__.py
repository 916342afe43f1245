"""TPU-native ops: EDT, connected components, sliding-window, TTA, STAPLE,
resize, and Pallas kernels for the hot paths."""
