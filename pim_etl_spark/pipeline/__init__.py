"""The PIM bronze→silver→gold dataflow (SURVEY §3.1 lifecycle)."""
