"""Engine function library: parity helpers, vector math, text metrics."""
