"""End-to-end pipeline plans (stage composition + checkpoint/resume)."""
