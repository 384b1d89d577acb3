"""Scalar/vector function library (Arrow-native kernels).

The reference's only scalar functions are regex submatch
(/root/reference/util/regexp.go:8-22) and ``{{field}}`` templating
(/root/reference/util/config.go:16-32); this package carries their
vectorized equivalents plus the hashing / text / vector kernels the
training-data operators need.
"""
