"""REST / SSE application surface (SURVEY §7 step 7)."""
