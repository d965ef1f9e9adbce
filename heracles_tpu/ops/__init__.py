"""TPU-native compute kernels: ring FFTs, Wigner/Legendre recurrences, SHTs."""
