"""Operator library — DataFrame-in / DataFrame-out transformations."""
