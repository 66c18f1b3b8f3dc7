"""DSP kernel library: reference-exact integer ops and fast float ops."""
