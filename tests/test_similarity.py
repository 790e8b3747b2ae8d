

def test_pca_top_component_converges(spark):
    from geostore_spark.operators.embeddings import GRAM_DIMS, pca_top_component

    lam, v = pca_top_component(spark, "/root/testdata/sf0.001", iters=30)
    assert lam > 0
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    assert len(v) == GRAM_DIMS
