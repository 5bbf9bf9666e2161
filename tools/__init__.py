"""Developer tools: local replicas of the driver's correctness/plan gates."""
