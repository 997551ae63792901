"""Input sources: pages table readers + content sniffing (SURVEY §2.1)."""
