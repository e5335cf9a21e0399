"""Multi-device execution: problem-batch sharding and cycle-ring pipelines."""
