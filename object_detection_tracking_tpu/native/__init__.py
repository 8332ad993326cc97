"""Native (C++) components, built on demand via g++ (see tracking/assignment.py)."""
