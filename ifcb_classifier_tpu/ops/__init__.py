"""Device-side ops: fused input preprocessing (resize/normalize/flip), metrics."""
