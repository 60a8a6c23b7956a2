"""Plan-time layer of the generator engine: schema model, rule inference,
rule→expression compilation, dependency ordering, and the executor that
turns a schema into referentially-consistent DataFrames."""
