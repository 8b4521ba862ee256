"""Structured Streaming layer — DataStream/Table-on-stream parity.

Mapping (SURVEY.md §1.3, §2.7, §2.13):

- Flink DataStream sources  -> ``sources``: file-replay (monitored dir),
  rate, socket, kafka pass-throughs
- event time + watermarks   -> ``withWatermark`` (bounded out-of-orderness;
  punctuated watermarks are documented as unsupported)
- windowed aggregations     -> ``windows``: tumble/hop/session with
  watermark, same F.window expressions as the batch queries
- retraction semantics      -> output modes: Flink append/retract/upsert
  ~= Spark append/update/complete + foreachBatch MERGE (``sinks``)
- ProcessFunction + state   -> ``stateful``: applyInPandasWithState
  wrappers (count windows, keyed process with timeouts)
"""
