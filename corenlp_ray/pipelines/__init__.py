"""Pipeline assembly: stage registry + end-to-end drivers."""
