"""Engine functions: aggregate builders and scalar helpers."""
