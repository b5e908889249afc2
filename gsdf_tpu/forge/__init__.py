"""Engineering layers built on the SDF core: threads, text."""
