"""Export layer: the reference's TCP query/subscribe protocol on Spark."""
