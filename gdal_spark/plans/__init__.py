"""Pipeline plans: manifest checkpoint/resume + the flagship pages pipeline."""
