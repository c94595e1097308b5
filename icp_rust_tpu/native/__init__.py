"""Native C++ host runtime: reference-faithful oracle + KD-tree baseline."""
