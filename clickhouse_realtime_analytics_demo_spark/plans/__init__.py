"""Query-planning layer: dialect shim, validated SQL gateway,
projection router, and plan introspection."""
