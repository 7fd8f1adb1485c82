"""DataFlow-combinator and mapper parity expressed over ray.data.Dataset."""
