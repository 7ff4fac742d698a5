"""Query-layer operators: the reference's fixed query shapes as DataFrame ops."""
