"""Engine operators (DataFrame-in, DataFrame-out, all lazy)."""
