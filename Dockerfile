# Deployment artifact for the Ray-Data spatial query engine (the reference
# ships a Dockerfile serving its HTTP API; this is the equivalent for the
# Ray-native engine). Build:
#   docker build -t soq-ray .
# Import an index, then serve it:
#   docker run -v $PWD/data:/data soq-ray import /data/extract.osm.pbf /data/index
#   docker run -p 8080:8080 -v $PWD/data:/data soq-ray server /data/index 8080
# On a multi-node Ray cluster, point RAY_ADDRESS at the head node instead of
# the default local mode and submit jobs/ scripts via `ray job submit`.
FROM rayproject/ray:2.49.2-py311

WORKDIR /app
COPY simple_osm_queries_ray/ ./simple_osm_queries_ray/
COPY jobs/ ./jobs/

# run from /app so Ray workers resolve the package through the driver's cwd
ENTRYPOINT ["python", "-m", "simple_osm_queries_ray.cli"]
CMD ["server", "/data/index", "8080"]
