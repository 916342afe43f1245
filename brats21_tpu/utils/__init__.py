"""Host-side utilities: metrics, meters, reporting, misc."""
