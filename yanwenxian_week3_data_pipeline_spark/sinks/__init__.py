"""Sinks: JSON records (driver-side pretty array for golden parity;
distributed JSONL for scale) and text reports."""
