"""Dataset stages: each module exposes a pure ``pa.Table -> pa.Table``
batch function (or a callable actor class for stateful stages) plus a
thin ``Dataset -> Dataset`` wrapper. The pure forms double as the
no-Ray reference path for golden fixtures and unit tests."""
