"""Pure per-token / per-string kernels and static lexicons (the analogue of
the reference's process/ string-function library and dictionary resources)."""
