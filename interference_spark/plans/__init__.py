"""Distributed physical plans for operators Spark lacks natively."""
