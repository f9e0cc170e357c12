"""Pipeline facades composing the operator stages (reference base.py contract)."""
