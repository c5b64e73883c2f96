"""Streaming subsystem: the exactly-once micro-batch loader (reference
jobclass/streaming_load.rb parity) and Structured Streaming operators
for the continuous-query inventory (SURVEY.md §2.3 streaming items).
"""
